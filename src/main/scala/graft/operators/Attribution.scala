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

  /** Linear MULTI-touch attribution — every qualifying touch shares its
    * entity's NEXT conversion (the nearest one strictly after it in
    * (ts, id) order, within `lookahead`), and each conversion's credit
    * splits EQUALLY across its touches in integer micro-units:
    * floor(unit / n_touches) per touch, so sums are exact integers in
    * any engine and the per-conversion shortfall is a documented
    * `< n_touches` units (never redistributed — determinism over
    * completeness). The REVERSE union-carry of [[lastTouch]]: one
    * window pass ordered (ts DESC, id DESC) carries the nearest
    * following conversion back onto each touch — no range join — then
    * one count per conversion and one broadcast-sized join back.
    *
    * @return one row per credited touch: (key, conv_id, conv_ts,
    *         touch_id, touch_kind, n_touches, credit)
    */
  def linearMultiTouch(events: DataFrame, touchKinds: Seq[String],
      convKind: String, lookahead: Long,
      unit: Long = 1000000000000L): DataFrame = {
    val w = Window.partitionBy("key")
      .orderBy(col("ts").desc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isConv = col("kind") === convKind
    val touches = events
      .withColumn("c_id", last(when(isConv, col("id")), ignoreNulls = true).over(w))
      .withColumn("c_ts", last(when(isConv, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind").isin(touchKinds: _*) &&
        col("c_ts").isNotNull && col("c_ts") - col("ts") <= lookahead)
    val counts = touches.groupBy(col("c_id"))
      .agg(count(lit(1)).as("n_touches"))
    touches.join(counts, Seq("c_id"))
      .select(col("key"), col("c_id").as("conv_id"),
        col("c_ts").as("conv_ts"), col("id").as("touch_id"),
        col("kind").as("touch_kind"), col("n_touches"),
        expr(s"CAST($unit div n_touches AS BIGINT)").as("credit"))
  }
}
