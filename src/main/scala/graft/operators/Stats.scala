package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Quantile / row-axis statistics (SURVEY §2.4 A11/A12, reference:
  * jobs/kpi-forecasting/kpi_forecasting/models/prophet_forecast.py:168-232
  * — p10/p50/p90 summaries of 1000-sample forecast paths, computed both
  * per-group (axis=0) and per-row across simulation columns (axis=1)).
  *
  * Exact linear-interpolation percentile with one fixed evaluation order
  * (`lo + (hi - lo) * frac`) so Spark and the DuckDB oracle produce
  * bit-identical doubles. For 100 TB use `percentile_approx` instead —
  * exact grouped percentiles need the full group in memory; these helpers
  * are the small-group/row-axis path (forecast summaries are ≤ thousands
  * of elements per group, exactly like the reference's pandas frames).
  */
object Stats {

  /** Percentile over an array column (row-axis, A12): sort + interpolate. */
  def arrayPercentile(arr: Column, p: Double): Column = {
    val sorted = array_sort(arr)
    val n = size(arr)
    val idx = lit(p) * (n - lit(1)).cast(DoubleType)
    val lo = floor(idx).cast(IntegerType)
    val hi = ceil(idx).cast(IntegerType)
    val vLo = element_at(sorted, lo + 1).cast(DoubleType)
    val vHi = element_at(sorted, hi + 1).cast(DoubleType)
    vLo + (vHi - vLo) * (idx - lo.cast(DoubleType))
  }

  /** Grouped exact percentile (A11): collect + sort + interpolate.
    * Deterministic across engines; swap for percentile_approx at scale. */
  def groupPercentile(value: Column, p: Double): Column =
    arrayPercentile(collect_list(value), p)

  /** Row-axis mean over an array column — sequential left fold so the
    * result is reproducible and oracle-comparable. */
  def arrayMean(arr: Column): Column =
    aggregate(transform(arr, e => e.cast(DoubleType)), lit(0.0), (a, x) => a + x) /
      size(arr)
}
