package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Stats

/** kpi-forecasting summarization frame (reference: jobs/kpi-forecasting/
  * kpi_forecasting/models/prophet_forecast.py:168-232 + base_forecast.py
  * :200-230): the 1000-sample forecast matrix is summarized per period,
  * merged with the observed overlap, reduced row-axis to mean/p10/p50/
  * p90, melted to long format with metadata, and pivoted to the legacy
  * wide frame.
  *
  * The simulation matrix is an `ArrayType(Double)` column (one array per
  * forecast date) — the reference's 1000 pandas columns become one array
  * column, so period aggregation is an elementwise `zip_with` reduce and
  * row-axis stats are HOFs; nothing leaves the executors.
  */
object ForecastSummary {

  /** Period-floor the forecast dates and sum the sample paths
    * elementwise within each period (pandas_extras.py:15-57
    * aggregate_to_period: floor + sum; samples stay aligned by index). */
  def aggregateToPeriod(forecast: DataFrame, period: String): DataFrame = {
    val floored = forecast
      .withColumn("period", to_date(date_trunc(period, col("ds"))))
    floored.groupBy("period")
      .agg(aggregate(
        collect_list(col("samples")),
        lit(null).cast(ArrayType(DoubleType)),
        (acc, x) => when(acc.isNull, x)
          .otherwise(zip_with(acc, x, (a, b) => a + b))).as("samples"))
  }

  /** Row-axis summary: mean/p10/p50/p90 across the samples of each
    * period (prophet_forecast.py:194-204 agg(axis=1)). */
  def summarize(periodSamples: DataFrame): DataFrame =
    periodSamples.select(col("period"),
      Stats.arrayMean(col("samples")).as("mean"),
      Stats.arrayPercentile(col("samples"), 0.1).as("p10"),
      Stats.arrayPercentile(col("samples"), 0.5).as("p50"),
      Stats.arrayPercentile(col("samples"), 0.9).as("p90"))

  /** Overlap merge: observed actuals replace the forecast mean where
    * present (prophet_forecast.py:188-192 left merge + fill). */
  def mergeObserved(summary: DataFrame, observed: DataFrame): DataFrame =
    summary.join(observed.select(col("period"), col("value").as("observed")),
        Seq("period"), "left")
      .withColumn("is_forecast", col("observed").isNull)
      .withColumn("value", coalesce(col("observed"), col("mean")))
      .drop("observed")

  /** Melt to the long output format with metadata columns
    * (prophet_forecast.py:221-232; base_forecast.py:200-230). */
  def toLong(merged: DataFrame, metricSlug: String, runDate: java.sql.Date): DataFrame =
    merged
      .unpivot(Array(col("period"), col("is_forecast")),
        Array(col("value"), col("p10"), col("p50"), col("p90")),
        "measure", "amount")
      .withColumn("metric_slug", lit(metricSlug))
      .withColumn("forecast_run_date", lit(runDate))

  /** Legacy wide pivot (prophet_forecast.py:300-321). */
  def toWide(long: DataFrame): DataFrame =
    long.groupBy("period")
      .pivot("measure", Seq("value", "p10", "p50", "p90"))
      .agg(first(col("amount")))
}
