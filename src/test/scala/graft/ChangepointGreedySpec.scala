package graft

import graft.operators.ChangepointTrend
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Greedy-forward k-changepoint selection (q309's operator): must
  * recover planted slope breaks in importance order, stop early on a
  * pure line (the stopping rule IS the point — Prophet's sparse-
  * changepoint prior as an explicit L0 rule), and emit the same text
  * the oracle replays. */
class ChangepointGreedySpec extends SparkTestBase {

  /** obs frame from (segment, x, y-cents): y as DECIMAL(18,2). */
  private def obs(rows: Seq[(String, Long, Long)]) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (s, x, cents) =>
        Row(s, x, new java.math.BigDecimal(cents).movePointLeft(2))
      }, 2),
      StructType(Seq(StructField("segment", StringType),
        StructField("x", LongType),
        StructField("y", DecimalType(18, 2)))))
    df
  }

  /** Piecewise-linear integer series over x = 0..n-1 with slope
    * changes at the given breaks (exact integer cents — zero noise, so
    * the SSE of the true model is 0 and recovery is unambiguous). */
  private def piecewise(seg: String, n: Int, baseSlope: Long,
      breaks: Seq[(Long, Long)]): Seq[(String, Long, Long)] =
    (0L until n.toLong).map { x =>
      val y = 700L + baseSlope * x +
        breaks.map { case (c, d) => d * math.max(0L, x - c) }.sum
      (seg, x, y * 100)
    }

  test("recovers 3 planted breaks in improvement order; line stops at 0") {
    // n=50 → grid step 5 → candidates x0 = 1, 6, 11, ..., 36.
    // breaks planted ON the grid with hierarchically dominant deltas
    // (400 ≫ 50 ≫ 25): greedy is an approximation — near-equal deltas
    // make round 1 prefer a compromise break between bends (verified
    // against an exact least-squares replay) — but with one dominant
    // bend per round the exact recovery [11, 26, 36] is provable and
    // the residual hits 0.
    val bent = piecewise("bent", 50, 2L,
      Seq((11L, 400L), (26L, -50L), (36L, 25L)))
    val line = piecewise("line", 50, 3L, Nil)
    val got = ChangepointTrend.fitGreedy(obs(bent ++ line), k = 10)
      .collect().map(r => r.getString(0) -> r).toMap

    val b = got("bent")
    assert(b.getLong(2) == 3L, s"expected 3 breaks, got ${b.getLong(2)}")
    val cps = Seq(3, 4, 5).map(i => b.getLong(i))
    assert(cps == Seq(11L, 26L, 36L), s"wrong breaks/order: $cps")
    assert(b.getDouble(6) < 1e-9, s"non-zero rel_sse: ${b.getDouble(6)}")

    val l = got("line")
    assert(l.getLong(2) == 0L, s"pure line grew ${l.getLong(2)} breaks")
    assert(l.isNullAt(3) && l.isNullAt(4) && l.isNullAt(5))
    // exact line: forecasts continue it
    assert(l.getDouble(7) == 700.0 + 3 * 50)
  }

  test("stopping rule: a barely-bent series takes 1 break, not 3") {
    // one real break; after it the residual is 0 so rounds 2-3 cannot
    // improve by tauPct and must stop
    val oneBreak = piecewise("s", 50, 1L, Seq((16L, 30L)))
    val r = ChangepointTrend.fitGreedy(obs(oneBreak), k = 10)
      .collect().head
    assert(r.getLong(2) == 1L, s"expected 1 break, got ${r.getLong(2)}")
    assert(r.getLong(3) == 16L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("selection order is by SSE improvement (biggest bend first)") {
    val bent = piecewise("s", 50, 0L, Seq((6L, 100L), (26L, -8L)))
    val r = ChangepointTrend.fitGreedy(obs(bent), k = 10)
      .collect().head
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 6L, s"first pick should be the big bend: $r")
    assert(r.getLong(4) == 26L)
  }

  test("staged session views are dropped after the fit (catalog hygiene)") {
    val before = spark.catalog.listTables().count()
    val df = ChangepointTrend.fitGreedy(
      obs(piecewise("s", 30, 1L, Nil)), k = 10)
    assert(spark.catalog.listTables().count() == before,
      "fitGreedy leaked temp views")
    // the returned frame stays executable AFTER the views are dropped
    // (resolved at sql() time, data in the checkpointed RDDs)
    assert(df.count() == 1)
  }
}
