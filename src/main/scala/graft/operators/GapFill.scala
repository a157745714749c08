package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-key time-series gap fill — densify each key's observed series
  * onto its full day spine and repair the holes two ways:
  * forward-fill (last observation carried forward) and linear
  * interpolation between the bracketing observations. The per-entity
  * daily rollups the reference maintains (SURVEY §2.11 — rollup with
  * late-data lag guards, date-spine joins in the forecast jobs; q46
  * builds the global spine) all assume missing days get repaired
  * before downstream models; this is that repair as a first-class
  * operator, and the same shape a feature-engineering pipeline uses
  * before windowed training aggregates.
  *
  * Determinism: the interpolated value is
  * `prev + ((next−prev)·(day−prev_day)) / (next_day−prev_day)` with
  * every term an exact integer and ONE double division + one addition
  * — correctly rounded IEEE both engines, so results hash-match.
  *
  * Scale shape: one shuffle of the observed rollup by key; the spine
  * explode (`sequence`) is generated NEXT TO each key's agg row (no
  * join against a global calendar table), and every window —
  * backward carry and forward bracket — shares the same key
  * partitioning, so densify + both fills ride the one exchange. Spine
  * width is bounded by each key's own [min, max] span, so a sparse
  * key never pays for the global calendar range.
  */
object GapFill {

  /** Densify (key, day, value) onto each key's [min(day), max(day)]
    * spine. `day` is an integer day number; observed `value` must be
    * non-null. Returns (key, day, observed value-or-null, is_gap,
    * ffill, lerp). */
  def fillDaily(observed: DataFrame, key: String = "key",
      day: String = "day", value: String = "v"): DataFrame = {
    val spine = observed
      .groupBy(col(key))
      .agg(min(col(day)).as("_d0"), max(col(day)).as("_d1"))
      .select(col(key), explode(sequence(col("_d0"), col("_d1"))).as(day))
    val dense = spine.join(observed, Seq(key, day), "left")

    val back = Window.partitionBy(key).orderBy(col(day))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(key).orderBy(col(day))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col(value).isNotNull, col(day))
    val prevV = last(col(value), ignoreNulls = true).over(back)
    val prevD = last(obsDay, ignoreNulls = true).over(back)
    val nextV = first(col(value), ignoreNulls = true).over(fwd)
    val nextD = first(obsDay, ignoreNulls = true).over(fwd)

    // interior gaps always have both brackets (the spine ends at
    // observed days); the lerp numerator stays exact-integer, then one
    // correctly-rounded double divide + add — engine-portable
    val lerp = when(col(value).isNotNull, col(value).cast(DoubleType))
      .otherwise(prevV.cast(DoubleType) +
        ((nextV - prevV) * (col(day) - prevD)).cast(DoubleType) /
          (nextD - prevD).cast(DoubleType))

    dense
      .withColumn("is_gap", col(value).isNull)
      .withColumn("ffill", prevV)
      .withColumn("lerp", lerp)
  }
}
