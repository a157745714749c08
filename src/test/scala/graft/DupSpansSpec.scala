package graft

import graft.llm.DupSpans

class DupSpansSpec extends SparkTestBase {
  import spark.implicits._

  private val w = 3

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    DupSpans.spans(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("a shared window in two docs yields one span of w tokens each") {
    val out = run(Seq(
      (1L, "a b c x y z"),
      (2L, "p q a b c r")))
    assert(out(1L) == ((6L, 1L, 3L)))
    assert(out(2L) == ((6L, 1L, 3L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // "a b c d" shared: windows (a b c) and (b c d) overlap -> span of 4
    val out = run(Seq(
      (1L, "a b c d x"),
      (2L, "y a b c d")))
    assert(out(1L) == ((5L, 1L, 4L)))
    assert(out(2L) == ((5L, 1L, 4L)))
  }

  test("disjoint duplicated regions stay separate spans") {
    val out = run(Seq(
      (1L, "a b c m m m m d e f"),
      (2L, "a b c n n n n d e f")))
    // two 3-token spans per doc, the middles differ
    assert(out(1L) == ((10L, 2L, 6L)))
    assert(out(2L) == ((10L, 2L, 6L)))
  }

  test("a window repeated only WITHIN one doc is not cross-doc duplication") {
    val out = run(Seq(
      (1L, "a b c a b c"),
      (2L, "x y z w v u")))
    assert(out.isEmpty)
  }

  test("docs shorter than w never produce windows") {
    val out = run(Seq((1L, "a b"), (2L, "a b")))
    assert(out.isEmpty)
  }
}
