package graft

import org.apache.spark.sql.functions._
import graft.llm.Surprisal

class SurprisalSpec extends SparkTestBase {
  import spark.implicits._

  test("bit-length proxy brackets true log2 surprisal within 1 bit") {
    // bitlen(N) - bitlen(c) vs log2(N/c): for N=2^20, c in 1..N the
    // proxy is (log2 N + 1) - (floor(log2 c) + 1) = 20 - floor(log2 c),
    // and 20 - log2(c) - 1 < 20 - floor(log2 c) <= 20 - log2(c) + 1
    val n = 1 << 20
    for (c <- Seq(1, 2, 3, 7, 1024, 123456, n)) {
      val proxy = (64 - java.lang.Long.numberOfLeadingZeros(n.toLong)) -
        (64 - java.lang.Long.numberOfLeadingZeros(c.toLong))
      val truth = math.log(n.toDouble / c) / math.log(2)
      assert(math.abs(proxy - truth) <= 1.0 + 1e-9,
        s"c=$c proxy=$proxy truth=$truth")
    }
  }

  test("tokenizer drops empties and is case-insensitive") {
    val r = Seq(("A  Fast,fox! 42", 1)).toDF("text", "id")
      .select(Surprisal.tokens(col("text")).as("t"))
      .head.getSeq[String](0)
    assert(r == Seq("a", "fast", "fox", "42"))
  }

  test("scoreDocs: rare-token docs score higher and get filtered") {
    val docs = (
      (1 to 8).map(i => (i.toLong, "the cat sat on the mat")) :+
        (99L, "zyzzyva qwyjibo xylotomous")
      ).toDF("doc_id", "text")
    val out = Surprisal.scoreDocs(docs, "doc_id", "text", 3, 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // common docs: every token appears >= 8 times of 51 total
    assert(out(1L)._3, "common doc should be kept")
    // the rare doc's tokens are singletons: surprisal = bitlen(51)-1 = 5
    assert(out(99L)._2 == 3 * 5)
    assert(!out(99L)._3, "all-singleton doc should be filtered at 3 bits")
  }

  test("empty-after-tokenize docs simply drop out (no null scores)") {
    val docs = Seq((1L, "hello hello"), (2L, "!!! ...")).toDF("doc_id", "text")
    val out = Surprisal.scoreDocs(docs, "doc_id", "text", 10, 1).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }
}
