package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.BqShims

/** Programmatic metric-view generation — the reference renders one
  * topline view + one history table per metric from templates
  * (/root/reference/jobs/webcompat-kb/webcompat_kb/metrics/
  * metrics.py:151-242): a weekly date spine LEFT JOINed to scored bugs
  * on open-interval containment (created ≤ week ≤ resolved), aggregating
  * COUNT + conditional score sums per metric type.
  *
  * Scale: the interval join uses the linear explode-to-weeks rewrite
  * (each bug row emits exactly the spine weeks it covers; one hash
  * aggregation) rather than a spine×bugs nested loop — same result,
  * survives any bug-table size. Open-ended intervals (unresolved bugs)
  * are clamped to the spine end.
  */
object MetricViews {

  final case class MetricDef(name: String, condition: Column)

  /** Weekly topline metric frame: one row per (Sunday-start) week with
    * bug_count / needs_diagnosis_score / not_supported_score /
    * total_score — CurrentMetricTable.template (metrics.py:192-219). */
  def toplineMetric(scored: DataFrame, metric: MetricDef,
      spineStart: java.sql.Date, spineEnd: java.sql.Date): DataFrame = {
    val spark = scored.sparkSession
    val start = BqShims.weekSunday(lit(spineStart))
    val weekLen = 7
    // spine week index bounds covered by each bug's [created, resolved]
    val created = to_date(col("creation_time"))
    val resolved = to_date(col("resolved_time"))
    val diffC = datediff(created, start)
    val diffR = datediff(coalesce(resolved, lit(spineEnd)), start)
    val maxK = floor(datediff(lit(spineEnd), start).cast(DoubleType) / weekLen)
      .cast(LongType)
    val firstK = greatest(
      ceil(diffC.cast(DoubleType) / weekLen).cast(LongType), lit(0L))
    val lastK = least(floor(diffR.cast(DoubleType) / weekLen).cast(LongType), maxK)

    val perWeek = scored
      .filter(metric.condition)
      .filter(firstK <= lastK)
      .select(col("*"), explode(sequence(firstK, lastK)).as("k"))
      .groupBy(date_add(start, (col("k") * weekLen).cast(IntegerType)).as("date"))
      .agg(
        count(col("number")).as("bug_count"),
        sum(when(col("metric_type_needs_diagnosis"), col("triage_score"))
          .otherwise(lit(BigDecimal(0)))).as("needs_diagnosis_score"),
        sum(when(col("metric_type_firefox_not_supported"), col("triage_score"))
          .otherwise(lit(BigDecimal(0)))).as("not_supported_score"),
        sum(col("triage_score")).as("total_score"))

    // restore empty weeks (LEFT JOIN spine semantics)
    val spine = spark.range(1).select(explode(
      sequence(start, lit(spineEnd), expr("interval 7 day"))).as("date"))
    spine.join(perWeek, Seq("date"), "left")
      .select(col("date"),
        coalesce(col("bug_count"), lit(0L)).as("bug_count"),
        coalesce(col("needs_diagnosis_score"), lit(BigDecimal(0))).as("needs_diagnosis_score"),
        coalesce(col("not_supported_score"), lit(BigDecimal(0))).as("not_supported_score"),
        coalesce(col("total_score"), lit(BigDecimal(0))).as("total_score"))
      .orderBy("date")
  }

  /** History-table append row shape (HistoryMetricTable, metrics.py:
    * 222-242): today's snapshot of the topline frame keyed by
    * recorded_date — pairs with Incremental.snapshotExists for the
    * once-per-day append guard (etl/metric.py:23-56). */
  def historyRows(topline: DataFrame, recordedDate: java.sql.Date): DataFrame =
    topline.select(lit(recordedDate).as("recorded_date"), col("*"))
}
