package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.DiffPatch

/** Mirrors jobs/webcompat-kb/tests/test_patch.py: round-trip pairs plus
  * a generated property — reverse-applying the unified diff of
  * (old → new) onto new recovers old. The diff generator below emits
  * python-difflib-compatible hunks for the cases exercised. */
class DiffPatchSpec extends AnyFunSuite {

  /** Minimal unified-diff builder (single global hunk, no context
    * windowing): enough to generate valid reference-style diffs. */
  private def unifiedDiff(a: Seq[String], b: Seq[String]): String = {
    // longest common subsequence walk
    val lcs = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- a.length - 1 to 0 by -1; j <- b.length - 1 to 0 by -1)
      lcs(i)(j) = if (a(i) == b(j)) lcs(i + 1)(j + 1) + 1
        else math.max(lcs(i + 1)(j), lcs(i)(j + 1))
    val body = new StringBuilder
    var i = 0; var j = 0
    while (i < a.length || j < b.length) {
      if (i < a.length && j < b.length && a(i) == b(j)) {
        body ++= " " + a(i); i += 1; j += 1
      } else if (j < b.length && (i == a.length || lcs(i)(j + 1) >= lcs(i + 1)(j))) {
        body ++= "+" + b(j); j += 1
      } else {
        body ++= "-" + a(i); i += 1
      }
    }
    s"@@ -1,${a.length} +1,${b.length} @@\n" + body.toString
  }

  private val refCases = Seq(
    ("line1\n", "line2\n"),
    ("", "line2\n"),
    ("line1\n", ""),
    ("line1\nline2\n", "line1\nline3\nline2\n"),
    ("line1\nline2\nline3\n", "line1\nline2\nline4\nline3\nline5\n"))

  test("reference round-trip cases (test_patch.py)") {
    refCases.foreach { case (doc1, doc2) =>
      val diff = unifiedDiff(splitLines(doc1), splitLines(doc2))
      assert(DiffPatch.reverseApplyDiff(doc2, diff) == doc1, s"case ($doc1, $doc2)")
    }
  }

  test("property: reverse-apply(unified_diff(old, new), new) == old (500 seeded samples)") {
    val lineGen = Gen.oneOf("alpha\n", "beta\n", "gamma\n", "delta\n", "eps\n")
    val docGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, lineGen)).map(_.mkString)
    val params = Gen.Parameters.default
    (0 until 500).foreach { i =>
      val seed = Seed(42L + i)
      val doc1 = docGen.pureApply(params, seed)
      val doc2 = docGen.pureApply(params, seed.slide)
      val diff = unifiedDiff(splitLines(doc1), splitLines(doc2))
      assert(DiffPatch.reverseApplyDiff(doc2, diff) == doc1,
        s"sample $i: ($doc1, $doc2)")
    }
  }

  test("malformed diffs raise like the reference") {
    intercept[DiffPatch.BadDiff](DiffPatch.reverseApplyDiff("x\n", "not a diff"))
    intercept[DiffPatch.BadDiff](
      DiffPatch.reverseApplyDiff("actual\n", "@@ -1,1 +1,1 @@\n mismatch\n"))
  }

  private def splitLines(s: String): Seq[String] =
    if (s.isEmpty) Seq.empty else s.split("(?<=\n)").toSeq
}
