package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generalized as-of join — for every left row, attach the single right
  * row with the greatest right.ts ≤ left.ts (backward) or smallest
  * right.ts ≥ left.ts (forward) for the same key, optionally within a
  * tolerance. The pandas `merge_asof` / kdb `aj` operator; the
  * reference's funnel and session jobs only need the last-touch special
  * case ([[Attribution]]) but a training-data pipeline wants the
  * general form (label joins, point-in-time feature lookup).
  *
  * Spark has no ASOF JOIN, and the naive formulation is a range θ-join
  * (O(|L|·|R|) candidate pairs per key). Implemented instead with the
  * UNION-CARRY trick: both sides are unioned into one stream, hash-
  * partitioned by key and sorted once, and the nearest right row is
  * carried onto each left row with `last(ignoreNulls)` over the running
  * frame — ONE shuffle, one sort, zero joins, linear in |L|+|R|.
  * The right row travels as a single struct column so arbitrary payload
  * schemas carry through without column bookkeeping.
  *
  * Determinism: among right rows tied on (key, ts) the carried row is
  * the one greatest in the window order (largest `tieBreak` backward,
  * see the orderBy below) — callers wanting a specific representative
  * should pre-dedupe right to one row per (key, ts), which also makes
  * the result independent of engine tie-breaking (the DuckDB oracle's
  * native ASOF JOIN picks an unspecified tied row).
  *
  * Scale shape: one hash exchange of |L|+|R| rows by key, one
  * sort-within-partitions; tolerance is a post-predicate. Skewed keys
  * behave like any single window (AQE handles moderate skew; extreme
  * skew wants a pre-bucketed key, same as every windowed op here).
  */
object AsOfJoin {

  /** Backward as-of join (latest right.ts ≤ left.ts per key).
    *
    * @param rightTieBreak right column ordering tied (key, ts) right
    *                      rows; the largest wins (backward)
    * @param tolerance  max (left.ts − right.ts) to accept, in ts units;
    *                   misses yield null right columns (left-join shape)
    * @param rightPrefix prefix for the attached right columns
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightTieBreak: String, tolerance: Option[Long] = None,
      rightPrefix: String = "r_"): DataFrame =
    joined(left, right, key, ts, rightTieBreak, tolerance, rightPrefix,
      forward = false)

  /** Forward as-of join (earliest right.ts ≥ left.ts per key). */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightTieBreak: String, tolerance: Option[Long] = None,
      rightPrefix: String = "r_"): DataFrame =
    joined(left, right, key, ts, rightTieBreak, tolerance, rightPrefix,
      forward = true)

  private def joined(left: DataFrame, right: DataFrame, key: String,
      ts: String, tieBreak: String, tolerance: Option[Long],
      rightPrefix: String, forward: Boolean): DataFrame = {
    val rType = StructType(right.schema.fields)
    val tbType = right.schema(tieBreak).dataType
    val l = left.select(col(key).as("_k"), col(ts).as("_ts"),
      lit(null).cast(tbType).as("_tb"), lit(1).as("_side"),
      struct(left.columns.map(col).toSeq: _*).as("_l"),
      lit(null).cast(rType).as("_r"))
    val r = right.select(col(key).as("_k"), col(ts).as("_ts"),
      col(tieBreak).as("_tb"), lit(0).as("_side"),
      lit(null).cast(StructType(left.schema.fields)).as("_l"),
      struct(right.columns.map(col).toSeq: _*).as("_r"))
    // right rows sort before left rows at equal ts → exact matches are
    // eligible (merge_asof's allow_exact_matches=True)
    val ord: Seq[Column] =
      if (forward) Seq(col("_ts").desc, col("_side").asc, col("_tb").asc)
      else Seq(col("_ts").asc, col("_side").asc, col("_tb").asc)
    val w = Window.partitionBy("_k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val inTol: Column = tolerance match {
      case Some(tol) if forward => col("_m")(ts) <= col("_ts") + tol
      case Some(tol) => col("_m")(ts) >= col("_ts") - tol
      case None => col("_m").isNotNull
    }
    val gated = carried.withColumn("_m",
      when(inTol, col("_m")))
    val outCols =
      left.columns.map(c => col("_l")(c).as(c)) ++
        right.columns.map(c => col("_m")(c).as(rightPrefix + c))
    gated.select(outCols.toSeq: _*)
  }
}
