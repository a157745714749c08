package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-touch attribution — credit each conversion to the most recent
  * qualifying touch by the same entity within a lookback horizon. The
  * canonical funnel-analytics join (the reference's funnel/metric jobs
  * stop at stage counts — q66/q67; attribution is the step after), and
  * the textbook case for the UNION-CARRY trick: instead of a per-row
  * point-in-time join (a range θ-join that explodes at scale), touches
  * and conversions are UNIONed into one stream, sorted once per
  * entity, and the "latest touch so far" is carried forward with
  * `last(ignoreNulls)` — turning an O(touches × conversions) range
  * join into ONE window pass over one shuffle by entity. [[Scd2]]'s
  * asOf is the static-dimension cousin; this is the event-to-event
  * form.
  *
  * Scale shape: one hash exchange by the entity key, one
  * sort-within-partitions, no join at all. The lookback filter is a
  * plain post-predicate. 100 TB of events attribute in a single pass.
  */
object Attribution {

  /** @param events   (key, ts, kind, id) — the unioned event log
    * @param touchKinds kinds that can receive credit
    * @param convKind   the kind being attributed
    * @param lookback   max ts distance (same units as ts) for credit
    * @return one row per conversion: (key, conv_id, conv_ts, touch_id,
    *         touch_ts, touch_kind) — touch columns null when no touch
    *         in the lookback (an unattributed conversion)
    */
  def lastTouch(events: DataFrame, touchKinds: Seq[String],
      convKind: String, lookback: Long): DataFrame = {
    val w = Window.partitionBy("key")
      .orderBy(col("ts"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col("kind").isin(touchKinds: _*)
    val carried = events
      .withColumn("t_id", last(when(isTouch, col("id")), ignoreNulls = true).over(w))
      .withColumn("t_ts", last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .withColumn("t_kind", last(when(isTouch, col("kind")), ignoreNulls = true).over(w))
    carried.filter(col("kind") === convKind)
      .select(col("key"), col("id").as("conv_id"), col("ts").as("conv_ts"),
        when(col("t_ts") >= col("ts") - lookback, col("t_id")).as("touch_id"),
        when(col("t_ts") >= col("ts") - lookback, col("t_ts")).as("touch_ts"),
        when(col("t_ts") >= col("ts") - lookback, col("t_kind")).as("touch_kind"))
  }
}
