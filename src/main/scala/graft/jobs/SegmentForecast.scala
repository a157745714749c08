package graft.jobs

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Per-segment forecasting frame with grid search + holdout validation —
  * the funnel-forecast shape (reference: jobs/kpi-forecasting/
  * kpi_forecasting/models/funnel_forecast.py:75-155 segment
  * partitioning; :365-412 per-segment grid search over parameters with
  * crossvalidation, independent model per segment; seeds fixed,
  * base_forecast.py:158-160).
  *
  * The model zoo here is a deterministic stand-in for Prophet (this
  * container has no Stan): constant-mean and linear-OLS candidates over
  * optionally windowed history. The *frame* is the ported semantics —
  * segments are independent (mapGroups), the grid is exhaustive, the
  * selection metric is holdout MSE with deterministic tie-break (first
  * in grid order wins), the winner refits on full history and predicts.
  *
  * Scale: one shuffle on segment; each group's work is bounded by its
  * own history (exactly the reference's applyInPandas boundary).
  */
object SegmentForecast {

  final case class Obs(segment: String, x: Double, y: Double)
  final case class ModelSpec(kind: String, window: Int) // window 0 = all history
  final case class SegmentFit(segment: String, kind: String, window: Int,
      holdout_mse: Double, forecast: Seq[Double])

  val defaultGrid: Seq[ModelSpec] = Seq(
    ModelSpec("mean", 0), ModelSpec("mean", 8),
    ModelSpec("linear", 0), ModelSpec("linear", 8))

  private final case class Fitted(predict: Double => Double)

  private def fit(spec: ModelSpec, data: Seq[Obs]): Fitted = {
    val windowed = if (spec.window > 0) data.takeRight(spec.window) else data
    spec.kind match {
      case "mean" =>
        val m = windowed.map(o => BigDecimal(o.y)).sum.toDouble / windowed.size
        Fitted(_ => m)
      case "linear" =>
        val n = windowed.size.toDouble
        val sx = windowed.map(o => BigDecimal(o.x)).sum.toDouble
        val sy = windowed.map(o => BigDecimal(o.y)).sum.toDouble
        val sxx = windowed.map(o => BigDecimal(o.x) * BigDecimal(o.x)).sum.toDouble
        val sxy = windowed.map(o => BigDecimal(o.x) * BigDecimal(o.y)).sum.toDouble
        val denom = n * sxx - sx * sx
        if (denom == 0) Fitted(_ => sy / n)
        else {
          val slope = (n * sxy - sx * sy) / denom
          val intercept = (sy - slope * sx) / n
          Fitted(x => intercept + slope * x)
        }
    }
  }

  private def mse(model: Fitted, holdout: Seq[Obs]): Double =
    holdout.map { o =>
      val e = BigDecimal(o.y) - BigDecimal(model.predict(o.x))
      e * e
    }.sum.toDouble / holdout.size

  /** Grid-search one segment: fit each spec on history minus the last
    * `holdout` points, score on the holdout, refit the winner on all. */
  def fitSegment(data: Seq[Obs], grid: Seq[ModelSpec], holdout: Int,
      horizon: Int): SegmentFit = {
    val sorted = data.sortBy(_.x)
    val (train, valid) = sorted.splitAt(math.max(sorted.size - holdout, 1))
    val scored = grid.map(spec => spec -> mse(fit(spec, train), valid))
    val (best, bestMse) = scored.minBy(_._2) // stable: first minimum wins
    val full = fit(best, sorted)
    val lastX = sorted.last.x
    val forecast = (1 to horizon).map(i => full.predict(lastX + i))
    SegmentFit(sorted.head.segment, best.kind, best.window, bestMse, forecast)
  }

  /** Distributed: independent grid search per segment via mapGroups. */
  def run(spark: SparkSession, observed: Dataset[Obs],
      grid: Seq[ModelSpec] = defaultGrid, holdout: Int = 4,
      horizon: Int = 3): Dataset[SegmentFit] = {
    implicit val enc = Encoders.product[SegmentFit]
    observed.groupByKey(_.segment)(Encoders.STRING)
      .mapGroups((_, rows) => fitSegment(rows.toSeq, grid, holdout, horizon))
  }
}
