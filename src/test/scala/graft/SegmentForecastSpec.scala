package graft

import graft.jobs.SegmentForecast
import graft.jobs.SegmentForecast.{ModelSpec, Obs}

/** Mirrors the reference's funnel-forecast test intent
  * (kpi_forecasting/tests/test_funnel_forecast.py: segment partitioning
  * + grid-search selection with deterministic fake models). */
class SegmentForecastSpec extends SparkTestBase {

  private def trendSeg = (0 until 20).map(i => Obs("trend", i, 2.0 * i + 1))
  private def flatSeg = (0 until 20).map(i => Obs("flat", i, if (i % 2 == 0) 10.0 else 12.0))

  test("grid search picks linear for a trend, mean for flat data") {
    val t = SegmentForecast.fitSegment(trendSeg, SegmentForecast.defaultGrid, 4, 3)
    assert(t.kind == "linear")
    assert(t.holdout_mse < 1e-18)
    // exact line: next points continue 2x+1
    assert(t.forecast == Seq(2.0 * 20 + 1, 2.0 * 21 + 1, 2.0 * 22 + 1))
    val f = SegmentForecast.fitSegment(flatSeg, SegmentForecast.defaultGrid, 4, 2)
    assert(f.kind == "mean")
  }

  test("tie-break is deterministic: first grid entry among minima wins") {
    val constant = (0 until 12).map(i => Obs("c", i, 5.0))
    val fit = SegmentForecast.fitSegment(constant, SegmentForecast.defaultGrid, 4, 1)
    // every model is exact on constant data → first grid entry (mean, all)
    assert(fit.kind == "mean" && fit.window == 0)
    assert(fit.forecast == Seq(5.0))
  }

  test("segments are fit independently via mapGroups") {
    import spark.implicits._
    val ds = (trendSeg ++ flatSeg).toDS()
    val out = SegmentForecast.run(spark, ds).collect().map(f => f.segment -> f.kind).toMap
    assert(out == Map("trend" -> "linear", "flat" -> "mean"))
  }

  test("windowed variant wins when history has a regime change") {
    // old regime flat at 0, recent 8 points strong trend: windowed linear
    // fits recent data better than full-history models
    val regime = (0 until 12).map(i => Obs("r", i, 0.0)) ++
      (12 until 20).map(i => Obs("r", i, 5.0 * (i - 12)))
    val fit = SegmentForecast.fitSegment(regime, SegmentForecast.defaultGrid, 4, 1)
    assert(fit.window == 8, s"expected windowed model, got $fit")
  }
}
