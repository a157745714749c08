package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mann–Kendall trend test — the non-parametric "is there a trend at
  * all" gate that pairs with the Theil–Sen slope (q315): S = Σ_{i<j}
  * sign(y_j − y_i) over the time-ordered pairs, with the tie-corrected
  * variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18. An
  * anomaly/forecast pipeline runs this BEFORE fitting a trend model:
  * a segment that fails the gate gets the mean model, not a slope
  * fitted to noise.
  *
  * Exactness: S and the variance NUMERATOR (18·Var, an integer) are
  * pure integer sums, and the α = 0.05 two-sided gate |S| ≥ 1.96·√Var
  * is evaluated by CROSS-MULTIPLICATION — 625·18·S² ≥ 2401·var18
  * (1.96 = 49/25) — so no square root, no libm, and every engine
  * reaches the identical verdict (the q253/q189 never-divide
  * discipline). Plain S (no continuity correction), documented.
  *
  * Scale shape: O(n²) pairs per segment via the segment-keyed
  * self-join (same bounded-daily-series contract as TheilSen); tie
  * groups come from a (segment, y) aggregate. No global windows.
  */
object MannKendall {

  /** @param obs (segment: string, x: integral order, y: comparable)
    * @return per segment: n, s, var18 (= 18·Var(S), integer),
    *         trend ∈ {increasing, decreasing, none} at α = 0.05 */
  def test(obs: DataFrame): DataFrame = {
    val base = obs.select(col("segment"), col("x").cast(LongType).as("x"),
      col("y"))
    val pairs = base.select(col("segment"), col("x").as("x1"), col("y").as("y1"))
      .join(base.select(col("segment"), col("x").as("x2"), col("y").as("y2")),
        Seq("segment"))
      .filter(col("x1") < col("x2"))
      .groupBy("segment")
      .agg(sum(signum((col("y2") - col("y1")).cast(DoubleType))
        .cast(LongType)).as("s"))
    val ties = base.groupBy("segment", "y").agg(count(lit(1)).as("t"))
      .groupBy("segment")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tsum"),
        sum("t").as("n"))
    pairs.join(ties, Seq("segment"))
      .withColumn("var18",
        col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tsum"))
      .withColumn("sig",
        col("s") =!= 0 &&
          lit(625L) * 18L * col("s") * col("s") >= lit(2401L) * col("var18"))
      .select(col("segment"), col("n"), col("s"), col("var18"),
        when(!col("sig"), "none")
          .when(col("s") > 0, "increasing").otherwise("decreasing")
          .as("trend"))
      .orderBy("segment")
  }
}
