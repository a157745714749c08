package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.ChangepointTrend

/** The relational Prophet-style changepoint fit must RECOVER a planted
  * slope break (identification), degrade to plain OLS semantics on a
  * pure line (no spurious break benefit), and keep its candidate set
  * bounded at k (the scale contract: O(k·n) rows, never O(n²)). */
class ChangepointTrendSpec extends SparkTestBase {

  private def series(name: String, n: Int)(y: Int => Double) = {
    import spark.implicits._
    (0 until n).map(i => (name, i.toLong, BigDecimal(y(i)).setScale(2)))
      .toDF("segment", "x", "y")
      .select(col("segment"), col("x"),
        col("y").cast(DecimalType(18, 2)).as("y"))
  }

  test("recovers a planted slope break at x=40 within the candidate grid") {
    // slope +2 before x=40, -3 after; 100 points, zero noise
    val df = series("s", 100)(i =>
      if (i < 40) 100.0 + 2.0 * i else 100.0 + 2.0 * 40 - 3.0 * (i - 40))
    val fit = ChangepointTrend.fit(df, k = 25).collect().head
    val c = fit.getAs[Long]("changepoint")
    // candidates are rank-spaced (step = 100/25 = 4), so the planted
    // break lands within one step of a candidate
    assert(math.abs(c - 40L) <= 4, s"changepoint $c far from planted 40")
    assert(math.abs(fit.getAs[Double]("slope_pre") - 2.0) < 0.2)
    assert(math.abs(fit.getAs[Double]("slope_post") - (-3.0)) < 0.2)
    // near-noise-free fit (small residual allowed: the break can land
    // up to step/2 off the nearest rank-spaced candidate)
    assert(fit.getAs[Double]("rel_sse") < 1e-3)
    // forecasts continue the post-break slope
    assert(math.abs(fit.getAs[Double]("f2") - fit.getAs[Double]("f1")
      - (-3.0)) < 0.5)
  }

  test("pure linear series: both slopes equal the true slope") {
    val df = series("lin", 60)(i => 50.0 + 1.5 * i)
    val fit = ChangepointTrend.fit(df, k = 25).collect().head
    assert(math.abs(fit.getAs[Double]("slope_pre") - 1.5) < 1e-6)
    assert(math.abs(fit.getAs[Double]("slope_post") - 1.5) < 1e-6)
    assert(fit.getAs[Double]("rel_sse") < 1e-9)
  }

  test("candidate set is bounded by k") {
    val df = series("big", 500)(i => i.toDouble)
    // k=10 → step = 500/10 = 50 → ≤ (0.8·500)/50 + 1 = 9 candidates:
    // the join fan-out is O(k·n) regardless of series length
    val wSeg = org.apache.spark.sql.expressions.Window.partitionBy("segment")
    val base = df
      .withColumn("x0", (col("x") - min("x").over(wSeg)).cast(LongType))
      .withColumn("rn", row_number().over(wSeg.orderBy("x")))
      .withColumn("n", count(lit(1)).over(wSeg))
    val lim = floor(col("n") * 0.8).cast(LongType)
    val step = greatest(lit(1L), floor(col("n") / 10).cast(LongType))
    val nCands = base.filter(col("rn") >= 2 && col("rn") <= lim &&
      pmod(col("rn") - 2, step) === 0).count()
    assert(nCands <= 10, s"$nCands candidates for k=10")
    assert(nCands >= 5)
  }

  test("joint 2-break fit recovers two planted slope breaks") {
    // slopes +2 / -3 / +1 with breaks at 30 and 60; 90 points no noise
    val df = series("s2", 90) { i =>
      if (i < 30) 2.0 * i
      else if (i < 60) 2.0 * 30 - 3.0 * (i - 30)
      else 2.0 * 30 - 3.0 * 30 + 1.0 * (i - 60)
    }
    val fit = ChangepointTrend.fit2(df, k = 10).collect().head
    val (c1, c2) = (fit.getAs[Long]("cp1"), fit.getAs[Long]("cp2"))
    // k=10 on 90 points → step 9: planted breaks land within one step
    assert(math.abs(c1 - 30L) <= 9, s"cp1 $c1 far from 30")
    assert(math.abs(c2 - 60L) <= 9, s"cp2 $c2 far from 60")
    // slopes compensate for up-to-step/2 break misplacement — a loose
    // band still pins the +/-/+ regime structure and magnitudes
    assert(math.abs(fit.getAs[Double]("slope1") - 2.0) < 0.6)
    assert(math.abs(fit.getAs[Double]("slope2") - (-3.0)) < 0.6)
    assert(math.abs(fit.getAs[Double]("slope3") - 1.0) < 0.6)
    assert(fit.getAs[Double]("rel_sse") < 5e-2)
    // the 2-break model must fit strictly better than the single-break
    val one = ChangepointTrend.fit(df, k = 10).collect().head
    assert(fit.getAs[Double]("rel_sse") < one.getAs[Double]("rel_sse"))
  }

  test("interval width grows with horizon and covers a planted-break holdout") {
    // Prophet interval semantics (r15 ask #2): train on 60 points with
    // a slope break 2→8 planted at x=41 (odd, so it sits ON the
    // rank-spaced candidate grid: step=60/25=2, candidates x0∈{1,3,…,47});
    // small deterministic noise keeps residuals honest. The holdout
    // continues the post-break slope for 7 more days.
    def noise(i: Int): Double = ((i * 37) % 5 - 2) * 0.1 // ∈ {−0.2..0.2}
    def trend(i: Int): Double =
      if (i < 41) 100.0 + 2.0 * i else 100.0 + 2.0 * 41 + 8.0 * (i - 41)
    val train = series("s", 60)(i => trend(i) + noise(i))
    val summary = ChangepointTrend
      .intervalSummary(train, k = 25, horizon = 7, nPaths = 1000)
      .collect().sortBy(_.getAs[Int]("h"))
    assert(summary.length === 7)
    val widths = summary.map(_.getAs[Double]("width")).toSeq
    // widening fan: monotone non-decreasing, strictly wider overall —
    // the changepoint-shift mass both grows in magnitude (linear in
    // h−g) and reaches more paths as h grows
    widths.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"width shrank: $widths")
    }
    assert(widths.last > widths.head * 1.5,
      s"no horizon growth: $widths")
    // coverage: each holdout point (the post-break slope continued,
    // noise-free) falls inside [p10, p90]
    summary.foreach { r =>
      val h = r.getAs[Int]("h")
      val actual = trend(59 + h)
      assert(r.getAs[Double]("p10") <= actual &&
        actual <= r.getAs[Double]("p90"),
        s"h=$h actual $actual outside [${r.getAs[Double]("p10")}, " +
          s"${r.getAs[Double]("p90")}]")
    }
  }

  test("multi-segment fit is independent per segment") {
    val df = series("a", 50)(i => if (i < 20) i.toDouble else 20.0 + 4.0 * (i - 20))
      .union(series("b", 50)(i => 200.0 - 2.0 * i))
    val fits = ChangepointTrend.fit(df, k = 25).collect()
      .map(r => r.getAs[String]("segment") -> r).toMap
    assert(fits.keySet === Set("a", "b"))
    assert(fits("a").getAs[Double]("slope_post") > 3.0)
    assert(math.abs(fits("b").getAs[Double]("slope_pre") - (-2.0)) < 1e-6)
  }
}
