package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Graphics-dashboard pipeline over struct-heavy glean pings (reference:
  * /root/reference/jobs/graphics-dashboard/graphics_dashboard/sql/
  * graphics_dashboard.sql): sampled scan with nested-field predicates
  * (:150-163), one-row-per-client QUALIFY dedup (:165-169), labeled-
  * counter folds (:113-121), SAFE_CAST version majors, and the
  * per-major + 'all' rollup (:199-215) as native grouping sets.
  *
  * Scale notes: nested predicates and pruned nested columns reach the
  * parquet scan (Catalyst nested-schema pruning); the dedup is one
  * window over client_id; the rollup is one shuffle via GROUPING SETS
  * instead of the reference's UNION fan-out.
  */
object GraphicsDashboard {

  /** Sampled, deduped working set: 1%-bucket sample, nested not-null
    * vendor filter, latest ping per client. */
  def workingSet(pings: DataFrame, sampleBuckets: Int = 1): DataFrame = {
    val sampled = pings
      .filter(col("sample_id") < sampleBuckets)
      .filter(col("metrics.string.gfx_adapter_primary_vendor_id").isNotNull)
    Dedup.latestPerKey(sampled, Seq("client_info.client_id"),
      Seq(col("submission_timestamp").desc, col("document_id").desc))
  }

  /** webgl success ratio from the labeled counter
    * (`canvas_webgl_success` keys 'true'/'false'; :113-121 fold). */
  private def counterValue(counter: Column, key: String): Column =
    coalesce(aggregate(
      filter(counter, e => e.getField("key") === key),
      lit(0L), (acc, e) => acc + e.getField("value")), lit(0L))

  /** Dashboard aggregate: per (fx major version, vendor) and the 'all'
    * major rollup — device share + webgl success. */
  def vendorShare(pings: DataFrame): DataFrame = {
    val ws = workingSet(pings)
      .select(
        coalesce(col("client_info.app_display_version").substr(lit(1), instr(col("client_info.app_display_version"), ".") - 1)
          .try_cast("bigint").cast(StringType), lit("unknown")).as("fx_major"),
        col("metrics.string.gfx_adapter_primary_vendor_id").as("vendor"),
        counterValue(col("metrics.labeled_counter.canvas_webgl_success"), "true").as("webgl_ok"),
        counterValue(col("metrics.labeled_counter.canvas_webgl_success"), "false").as("webgl_fail"))
    ws.rollup(col("fx_major"), col("vendor"))
      .agg(count(lit(1)).as("n_clients"),
        sum(col("webgl_ok")).as("webgl_ok"), sum(col("webgl_fail")).as("webgl_fail"))
      .select(coalesce(col("fx_major"), lit("all")).as("fx_major"),
        coalesce(col("vendor"), lit("all")).as("vendor"),
        col("n_clients"), col("webgl_ok"), col("webgl_fail"))
  }
}
