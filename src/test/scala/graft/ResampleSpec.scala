package graft

import graft.llm.Resample
import org.apache.spark.sql.functions._

/** Systematic resampling invariants (q314's operator): exactly m total
  * draws, every multiplicity within 1 of its exact expectation,
  * determinism across range-partition counts, zero-weight exclusion. */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private def weighted(rows: Seq[(Long, Long)]) =
    rows.toDF("id", "w")

  test("total multiplicity is EXACTLY m (the systematic guarantee)") {
    val rnd = new scala.util.Random(42)
    val docs = weighted((1L to 200L).map(i => (i, 1L + rnd.nextInt(500))))
    for (m <- Seq(1L, 7L, 100L, 1000L)) {
      val total = Resample.systematic(docs, "id", col("w"), m)
        .agg(sum("mult")).collect()(0).getLong(0)
      assert(total == m, s"m=$m drew $total")
    }
  }

  test("each multiplicity is within 1 of exact expectation m*w/W") {
    val rnd = new scala.util.Random(7)
    val docs = weighted((1L to 300L).map(i => (i, 1L + rnd.nextInt(1000))))
    val m = 500L
    val bigW = docs.agg(sum("w")).collect()(0).getLong(0)
    val rows = Resample.systematic(docs, "id", col("w"), m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (id, w, mult) =>
      // |mult*W - m*w| < W  <=>  |mult - m*w/W| < 1
      assert(math.abs(mult * bigW - m * w) < bigW,
        s"id=$id w=$w mult=$mult drifts >1 from expectation")
    }
  }

  test("deterministic across range-partition counts") {
    val docs = weighted((1L to 150L).map(i => (i, (i % 17) + 1)))
    def run(parts: Int) =
      Resample.systematic(docs, "id", col("w"), 64L, nRangeParts = parts)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(run(2) == run(32))
  }

  test("zero-weight rows can never be drawn; heavy row dominates") {
    val docs = weighted(Seq((1L, 0L), (2L, 1L), (3L, 99L)))
    val got = Resample.systematic(docs, "id", col("w"), 10L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(!got.contains(1L))
    // expectation: id3 = 9.9 -> 9 or 10; id2 = 0.1 -> 0 or 1; sum 10
    assert(got(3L) >= 9L && got.values.sum == 10L, s"got $got")
  }
}
