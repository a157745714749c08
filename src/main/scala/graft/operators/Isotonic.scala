package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Isotonic (monotone non-decreasing) regression over score bins —
  * the calibration-map fitter behind "calibrate the quality filter's
  * scores before thresholding" (the step after q252's reliability
  * audit FAILS a model): fitted rates are the closest non-decreasing
  * sequence to the empirical per-bin rates under weighted L2, the
  * exact problem PAV (pool-adjacent-violators) solves.
  *
  * Computed by the CLOSED minimax identity instead of the sequential
  * PAV loop (Barlow et al. 1972):
  *
  *   fitted_i = max_{j ≤ i} min_{k ≥ i} avg(pos, [j..k]) / avg(n, [j..k])
  *
  * which is pure relational algebra over interval prefix sums: with B
  * bins there are O(B²) intervals and O(B²) (i, j) minima — and B is
  * BOUNDED by construction (a calibration map has tens of bins; the
  * corpus-sized work happened upstream in the binning aggregate), so
  * every window/join here rides a tiny frame (the q296 16-row-shard
  * discipline). Interval averages are single divisions of exact
  * integer prefix sums — identical IEEE doubles on every engine, so
  * min/max selections and the published map replay bit-for-bit.
  * PavaSpec pins equivalence against a sequential PAV reference on
  * random inputs.
  */
object Isotonic {

  /** @param bins (bin: integral ascending key, n: count > 0,
    *             pos: successes 0..n) — one row per score bin
    * @return (bin, n, pos, rate, fitted, pooled) — `fitted` the
    *         isotonic rate, `pooled` true where pooling moved it */
  def fitBins(bins: DataFrame): DataFrame = {
    val w = Window.orderBy("bin")
    val pre = bins.select(col("bin").cast(LongType).as("bin"),
        col("n").cast(LongType).as("n"), col("pos").cast(LongType).as("pos"))
      .withColumn("cn", sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cp", sum("pos").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val j = pre.select(col("bin").as("j"), (col("cn") - col("n")).as("cn0"),
      (col("cp") - col("pos")).as("cp0"))
    val k = pre.select(col("bin").as("k"), col("cn"), col("cp"))
    val seg = j.join(k, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cp") - col("cp0")).cast(DoubleType) /
          (col("cn") - col("cn0")).cast(DoubleType)).as("avg"))
    val i = pre.select(col("bin").as("i"))
    val fitted = i.join(seg, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min("avg").as("mn"))
      .groupBy("i").agg(max("mn").as("fitted"))
    pre.join(fitted, pre("bin") === fitted("i"))
      .select(col("bin"), col("n"), col("pos"),
        (col("pos").cast(DoubleType) / col("n").cast(DoubleType)).as("rate"),
        col("fitted"))
      .withColumn("pooled", col("fitted") =!= col("rate"))
      .orderBy("bin")
  }
}
