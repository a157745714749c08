package graft

import org.apache.spark.sql.functions._
import graft.jobs.ForecastSummary

/** Mirrors test_pandas_extras.py (exact period flooring/summing) and the
  * summarization frames of test_funnel_forecast.py with deterministic
  * fake sample paths. */
class ForecastSummarySpec extends SparkTestBase {
  import spark.implicits._

  // two months of daily forecasts, 4 sample paths each, path j on day d
  // contributes (j+1)*10 + d' where d' = day ordinal — easy closed forms
  private def forecast = {
    val days = (1 to 5).map(d => java.sql.Date.valueOf(f"2024-01-$d%02d")) ++
      (1 to 3).map(d => java.sql.Date.valueOf(f"2024-02-$d%02d"))
    days.zipWithIndex.map { case (d, i) =>
      (d, (0 until 4).map(j => (j + 1) * 10.0 + i).toArray)
    }.toDF("ds", "samples")
  }

  test("aggregateToPeriod: elementwise path sums within month") {
    val m = ForecastSummary.aggregateToPeriod(forecast, "month")
      .orderBy("period").collect()
    assert(m.length == 2)
    val jan = m.head.getSeq[Double](1)
    // January: 5 days, path j sum = Σ_{i=0..4} ((j+1)*10 + i) = 50(j+1) + 10
    assert(jan == Seq(60.0, 110.0, 160.0, 210.0))
    val feb = m(1).getSeq[Double](1)
    // February: 3 days (i = 5,6,7): 30(j+1) + 18
    assert(feb == Seq(48.0, 78.0, 108.0, 138.0))
  }

  test("summarize + mergeObserved + toLong + toWide round-trip") {
    val sum = ForecastSummary.summarize(
      ForecastSummary.aggregateToPeriod(forecast, "month"))
    val jan = sum.orderBy("period").collect().head
    // sorted jan sums: 60,110,160,210 → mean 135, p50 = 135
    assert(jan.getDouble(1) == 135.0)
    assert(jan.getDouble(3) == 135.0)

    val observed = Seq((java.sql.Date.valueOf("2024-01-01"), 999.0))
      .toDF("period", "value")
    val merged = ForecastSummary.mergeObserved(sum, observed)
    val byPeriod = merged.collect().map(r => r.getDate(0).toString -> r).toMap
    assert(byPeriod("2024-01-01").getAs[Double]("value") == 999.0)
    assert(!byPeriod("2024-01-01").getAs[Boolean]("is_forecast"))
    assert(byPeriod("2024-02-01").getAs[Boolean]("is_forecast"))
    assert(byPeriod("2024-02-01").getAs[Double]("value") ==
      byPeriod("2024-02-01").getAs[Double]("mean"))

    val long = ForecastSummary.toLong(merged, "dau", java.sql.Date.valueOf("2024-03-01"))
    assert(long.count() == 2 * 4) // 2 periods × 4 measures
    assert(long.select("metric_slug").distinct().collect().head.getString(0) == "dau")

    val wide = ForecastSummary.toWide(long).orderBy("period").collect()
    assert(wide.length == 2)
    assert(wide.head.getAs[Double]("value") == 999.0)
  }
}
