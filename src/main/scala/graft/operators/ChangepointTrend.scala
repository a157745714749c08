package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Prophet-style single-changepoint trend fit, fully relational.
  *
  * Prophet's trend component (Taylor & Letham 2018, "Forecasting at
  * scale") is a continuous piecewise-linear function with slope shifts
  * at potential changepoints placed over the first 80% of the series —
  * the structural element the engine's forecast zoo (mean / linear /
  * sat / seasonal, `jobs/SegmentForecast`) lacked next to the reference
  * (kpi-forecasting's `prophet_forecast.py`, DELTAS §2). This operator
  * closes the trend-changepoint half of that gap deterministically:
  *
  *   ŷ(x) = b0 + b1·x + b2·max(0, x − c),  c chosen from ≤ `k`
  *   candidates (evenly rank-spaced over the first 80%, Prophet's
  *   default placement) by least SSE.
  *
  * Everything is expressed as ONE Spark plan — no per-segment driver
  * loop, no mapGroups: candidates come from a rank filter, each
  * (segment, candidate) pair folds its sufficient statistics in a
  * single map-side-combined groupBy, the 3×3 normal equations solve in
  * closed form (Cramer) as column arithmetic, and the per-segment
  * argmin is the usual top-1 window idiom. Scale shape: the candidate
  * join multiplies the series by ≤ k = O(25), so the whole fit is
  * O(k·n) rows through two hash exchanges — linear in the corpus, and
  * each segment's fit is independent (the reference fits segments
  * independently too).
  *
  * Exactness contract (the q110/q266 pattern): sufficient statistics
  * are EXACT — integer sums for the x-side moments, decimal sums for
  * the y-side — converted to double once, after aggregation; the
  * Cramer solve and SSE ranking are then fixed-order IEEE expression
  * trees that DuckDB replays term-for-term, so the fitted slopes,
  * chosen changepoints, and forecasts hash-match the oracle instead of
  * drifting in the last ulp.
  *
  * Input: (segment: string, x: numeric "time index", y: decimal).
  * Output per segment: n_points, changepoint (x units), slope_pre,
  * slope_post, sse, f1/f2/f3 (1/2/3-step-ahead forecasts).
  */
object ChangepointTrend {

  /** det of [[a,b,c],[d,e,f],[g,h,i]] by first-row cofactors, written
    * once so Spark and the SQL oracle share the exact IEEE shape:
    * a*(e*i - f*h) - b*(d*i - f*g) + c*(d*h - e*g). */
  private def det3(a: Column, b: Column, c: Column,
      d: Column, e: Column, f: Column,
      g: Column, h: Column, i: Column): Column =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** 4×4 determinant, first-row cofactor expansion into [[det3]] minors
    * — the same association the SQL generator in the q276 oracle emits,
    * so both engines run one IEEE chain. `m` is row-major. */
  private def det4(m: Seq[Seq[Column]]): Column = {
    def minor(col0: Int): Column = {
      val cols = (0 to 3).filterNot(_ == col0)
      val r = (1 to 3).map(i => cols.map(j => m(i)(j)))
      det3(r(0)(0), r(0)(1), r(0)(2),
        r(1)(0), r(1)(1), r(1)(2),
        r(2)(0), r(2)(1), r(2)(2))
    }
    m(0)(0) * minor(0) - m(0)(1) * minor(1) +
      m(0)(2) * minor(2) - m(0)(3) * minor(3)
  }

  def fit(obs: DataFrame, k: Int = 25): DataFrame = {
    val wSeg = Window.partitionBy("segment")
    val wOrd = wSeg.orderBy("x")
    // integer day offsets from the segment's first point: keeps the
    // x-side moment sums exact in long arithmetic
    val base = obs
      .withColumn("x0", (col("x") - min("x").over(wSeg)).cast(LongType))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wSeg))
      .withColumn("xmax0", max("x0").over(wSeg))
    // ≤ k candidates, evenly rank-spaced over the first 80% (Prophet's
    // placement): step = max(1, n/k), positions 2, 2+step, … ≤ 0.8n.
    // Integer arithmetic only — both engines derive the same set.
    val lim = floor(col("n") * 0.8).cast(LongType)
    val step = greatest(lit(1L), floor(col("n") / k).cast(LongType))
    val cands = base
      .filter(col("rn") >= 2 && col("rn") <= lim &&
        pmod(col("rn") - 2, step) === 0)
      .select(col("segment"), col("x0").as("c"))
    // sufficient statistics per (segment, candidate): x-moments exact
    // in long, y-moments exact in decimal; ONE double conversion after
    val feat = base.join(cands, Seq("segment"))
      .withColumn("h", greatest(lit(0L), col("x0") - col("c")))
    def d(c: Column): Column = c.cast(DoubleType)
    val sums = feat.groupBy("segment", "c")
      .agg(
        d(count(lit(1))).as("sn"),
        d(sum(col("x0"))).as("sx"),
        d(sum(col("x0") * col("x0"))).as("sxx"),
        d(sum(col("h"))).as("sh"),
        d(sum(col("h") * col("h"))).as("shh"),
        d(sum(col("x0") * col("h"))).as("sxh"),
        d(sum(col("y"))).as("sy"),
        // x-side factors cast to DECIMAL(18,0) before the product:
        // long × decimal would hit Spark's 38-precision cap and round —
        // decimal(18,0) × decimal(18,2) stays exact at decimal(37,2)
        d(sum(col("y") * col("x0").cast(DecimalType(18, 0)))).as("sxy"),
        d(sum(col("y") * col("h").cast(DecimalType(18, 0)))).as("shy"),
        d(sum(col("y") * col("y"))).as("syy"),
        max("xmax0").as("xmax0"))
    // Cramer on the normal equations [[n,sx,sh],[sx,sxx,sxh],[sh,sxh,shh]]
    val solved = sums
      .withColumn("det", det3(
        col("sn"), col("sx"), col("sh"),
        col("sx"), col("sxx"), col("sxh"),
        col("sh"), col("sxh"), col("shh")))
      .filter(col("det") =!= 0.0)
      .withColumn("b0", det3(
        col("sy"), col("sx"), col("sh"),
        col("sxy"), col("sxx"), col("sxh"),
        col("shy"), col("sxh"), col("shh")) / col("det"))
      .withColumn("b1", det3(
        col("sn"), col("sy"), col("sh"),
        col("sx"), col("sxy"), col("sxh"),
        col("sh"), col("shy"), col("shh")) / col("det"))
      .withColumn("b2", det3(
        col("sn"), col("sx"), col("sy"),
        col("sx"), col("sxx"), col("sxy"),
        col("sh"), col("sxh"), col("shy")) / col("det"))
      .withColumn("sse",
        col("syy") - (col("b0") * col("sy") + col("b1") * col("sxy") +
          col("b2") * col("shy")))
    // per-segment argmin(SSE), ties to the earliest changepoint — the
    // top-1 window idiom (eligible for the WindowTopKRewrite). Ranked
    // on the ROUNDED scale-free SSE, not the raw double: two engines
    // computing the same IEEE chains can still differ ~1e-12 relative
    // (FP-contraction policy), and a raw-double argmin would flip on a
    // near-tied candidate pair; at 9 decimals of an O(1) quantity the
    // grids agree and the c tiebreak resolves rounding-ties the same
    // way everywhere.
    val wBest = Window.partitionBy("segment")
      .orderBy(round(col("sse") / col("syy"), 9), col("c"))
    def fc(stepAhead: Int): Column = {
      val xf = col("xmax0") + stepAhead
      col("b0") + col("b1") * xf +
        col("b2") * greatest(lit(0L), xf - col("c"))
    }
    solved
      .withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .select(col("segment"),
        col("sn").cast(LongType).as("n_points"),
        col("c").as("changepoint"),
        round(col("b1"), 6).as("slope_pre"),
        round(col("b1") + col("b2"), 6).as("slope_post"),
        // published SCALE-FREE: raw SSE is O(syy) and rounding it at
        // fixed decimals would demand ~1e-12 relative cross-engine
        // agreement — beyond what differing FP-contraction policies
        // give on the Cramer chains (measured: last-digit flips at
        // sf0.1). sse/syy is O(1), so the same chains agree to far
        // below the rounding grid at every scale.
        round(col("sse") / col("syy"), 6).as("rel_sse"),
        round(fc(1), 4).as("f1"), round(fc(2), 4).as("f2"),
        round(fc(3), 4).as("f3"))
      .orderBy("segment")
  }

  /** JOINT two-changepoint trend: ŷ = b0 + b1·x + b2·relu(x−c1)
    * + b3·relu(x−c2) over all candidate PAIRS c1 < c2 from a k-sized
    * rank-spaced set — jointly least-SSE, not greedy, so a break that
    * only pays off in combination is still found. Same architecture as
    * [[fit]] one dimension up: the pair grid is ≤ C(k,2) per segment
    * (k defaults to 10 → ≤ 36 pairs, still O(k²·n) = linear in the
    * corpus for fixed k), the normal equations are 4×4 and solve by
    * [[det4]] Cramer in the shared fixed-IEEE shape, and the argmin
    * ranks on the 9-decimal rounded scale-free SSE with (c1, c2)
    * tiebreak. Degenerate pairs (no points past c2, collinear
    * features) have det = 0 and are filtered, matching the oracle. */
  def fit2(obs: DataFrame, k: Int = 10): DataFrame = {
    val wSeg = Window.partitionBy("segment")
    val wOrd = wSeg.orderBy("x")
    val base = obs
      .withColumn("x0", (col("x") - min("x").over(wSeg)).cast(LongType))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wSeg))
      .withColumn("xmax0", max("x0").over(wSeg))
    val lim = floor(col("n") * 0.8).cast(LongType)
    val step = greatest(lit(1L), floor(col("n") / k).cast(LongType))
    val cand = base
      .filter(col("rn") >= 2 && col("rn") <= lim &&
        pmod(col("rn") - 2, step) === 0)
      .select(col("segment"), col("x0"))
    val pairs = cand.select(col("segment"), col("x0").as("c1"))
      .join(cand.select(col("segment"), col("x0").as("c2")), Seq("segment"))
      .filter(col("c1") < col("c2"))
    val feat = base.join(pairs, Seq("segment"))
      .withColumn("h1", greatest(lit(0L), col("x0") - col("c1")))
      .withColumn("h2", greatest(lit(0L), col("x0") - col("c2")))
    def d(c: Column): Column = c.cast(DoubleType)
    def dec(c: Column): Column = c.cast(DecimalType(18, 0))
    val sums = feat.groupBy("segment", "c1", "c2")
      .agg(
        d(count(lit(1))).as("sn"),
        d(sum(col("x0"))).as("sx"),
        d(sum(col("x0") * col("x0"))).as("sxx"),
        d(sum(col("h1"))).as("s1"),
        d(sum(col("h1") * col("h1"))).as("s11"),
        d(sum(col("x0") * col("h1"))).as("sx1"),
        d(sum(col("h2"))).as("s2"),
        d(sum(col("h2") * col("h2"))).as("s22"),
        d(sum(col("x0") * col("h2"))).as("sx2"),
        d(sum(col("h1") * col("h2"))).as("s12"),
        d(sum(col("y"))).as("sy"),
        d(sum(col("y") * dec(col("x0")))).as("sxy"),
        d(sum(col("y") * dec(col("h1")))).as("s1y"),
        d(sum(col("y") * dec(col("h2")))).as("s2y"),
        d(sum(col("y") * col("y"))).as("syy"),
        max("xmax0").as("xmax0"))
    // normal-equation matrix rows and Cramer column replacements
    def A = Seq(
      Seq(col("sn"), col("sx"), col("s1"), col("s2")),
      Seq(col("sx"), col("sxx"), col("sx1"), col("sx2")),
      Seq(col("s1"), col("sx1"), col("s11"), col("s12")),
      Seq(col("s2"), col("sx2"), col("s12"), col("s22")))
    val r = Seq(col("sy"), col("sxy"), col("s1y"), col("s2y"))
    def replaced(j: Int): Seq[Seq[Column]] =
      A.zipWithIndex.map { case (row, i) => row.updated(j, r(i)) }
    val solved = sums
      .withColumn("det", det4(A))
      .filter(col("det") =!= 0.0)
      .withColumn("b0", det4(replaced(0)) / col("det"))
      .withColumn("b1", det4(replaced(1)) / col("det"))
      .withColumn("b2", det4(replaced(2)) / col("det"))
      .withColumn("b3", det4(replaced(3)) / col("det"))
      .withColumn("sse",
        col("syy") - (col("b0") * col("sy") + col("b1") * col("sxy") +
          col("b2") * col("s1y") + col("b3") * col("s2y")))
    val wBest = Window.partitionBy("segment")
      .orderBy(round(col("sse") / col("syy"), 9), col("c1"), col("c2"))
    def fc(stepAhead: Int): Column = {
      val xf = col("xmax0") + stepAhead
      col("b0") + col("b1") * xf +
        col("b2") * greatest(lit(0L), xf - col("c1")) +
        col("b3") * greatest(lit(0L), xf - col("c2"))
    }
    solved
      .withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .select(col("segment"),
        col("sn").cast(LongType).as("n_points"),
        col("c1").as("cp1"), col("c2").as("cp2"),
        round(col("b1"), 6).as("slope1"),
        round(col("b1") + col("b2"), 6).as("slope2"),
        round(col("b1") + col("b2") + col("b3"), 6).as("slope3"),
        round(col("sse") / col("syy"), 6).as("rel_sse"),
        round(fc(1), 4).as("f1"), round(fc(2), 4).as("f2"),
        round(fc(3), 4).as("f3"))
      .orderBy("segment")
  }
}
