package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Theil–Sen robust trend — median of all pairwise slopes, the
  * estimator that shrugs off ~29% outlier contamination where OLS
  * (q178's grouped trend) follows a single corrupted day. The robust
  * complement to the forecast zoo's least-squares fits and the MAD
  * outlier gate (q179): anomaly pipelines fit Theil–Sen to get a
  * baseline the anomalies themselves cannot bend.
  *
  * Exactness contract: slopes are single divisions of EXACT deltas —
  * `CAST(y2−y1 AS DOUBLE) / CAST(x2−x1 AS DOUBLE)` with decimal y and
  * integer x, correctly rounded and identical on every IEEE engine —
  * and the median is SELECTED, not averaged: lower median by
  * row_number over the total order (slope, x1, x2), so no arithmetic
  * ever mixes two pair slopes. Intercept = lower median of
  * `CAST(y AS DOUBLE) − slope·x` under (resid, x). A replaying engine
  * reproduces every comparison.
  *
  * Scale shape: O(n²) pairs per segment via a segment-keyed self-join
  * — the right shape for the bounded per-segment daily series this
  * targets (n ≈ 30..1000 → ≤ 500k pairs); all windows are
  * segment-partitioned (no global sort, no single-partition window).
  * For unbounded series a production caller samples pairs first; the
  * estimator is unchanged.
  */
object TheilSen {

  /** @param obs (segment: string, x: integral, y: decimal)
    * @return per segment: n_points, n_pairs, slope (round 9),
    *         intercept (round 4), f1/f2/f3 forecasts (round 4) */
  def fit(obs: DataFrame): DataFrame = {
    val base = obs.select(col("segment"), col("x").cast(LongType).as("x"),
      col("y"))
    val pairs = base.select(col("segment"), col("x").as("x1"), col("y").as("y1"))
      .join(base.select(col("segment"), col("x").as("x2"), col("y").as("y2")),
        Seq("segment"))
      .filter(col("x1") < col("x2"))
      .withColumn("slope",
        (col("y2") - col("y1")).cast(DoubleType) /
          (col("x2") - col("x1")).cast(DoubleType))
    val wSeg = Window.partitionBy("segment")
    val med = pairs
      .withColumn("rn",
        row_number().over(wSeg.orderBy(col("slope"), col("x1"), col("x2"))))
      .withColumn("cnt", count(lit(1)).over(wSeg))
      .filter(col("rn") === floor((col("cnt") + 1) / 2))
      .select(col("segment"), col("slope"), col("cnt").as("n_pairs"))
    val inter = base.join(med, Seq("segment"))
      .withColumn("resid",
        col("y").cast(DoubleType) - col("slope") * col("x"))
      .withColumn("rn", row_number().over(wSeg.orderBy(col("resid"), col("x"))))
      .withColumn("n_points", count(lit(1)).over(wSeg))
      .withColumn("xmax", max("x").over(wSeg))
      .filter(col("rn") === floor((col("n_points") + 1) / 2))
    def fc(h: Int): Column =
      round(col("slope") * (col("xmax") + h) + col("resid"), 4)
    inter.select(col("segment"), col("n_points"), col("n_pairs"),
      round(col("slope"), 9).as("slope"),
      round(col("resid"), 4).as("intercept"),
      fc(1).as("f1"), fc(2).as("f2"), fc(3).as("f3"))
      .orderBy("segment")
  }
}
