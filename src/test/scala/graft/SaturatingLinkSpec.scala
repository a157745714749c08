package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jobs.SegmentForecast
import graft.jobs.SegmentForecast.{ModelSpec, Obs}

/** Quantifies the documented Prophet delta (DELTAS.md §2): the `sat`
  * model's rational saturating link `z = 1e6·y/(cap−y)` versus (a) a
  * logit-link fit `z = ln(y/(cap−y))` under the SAME data-pinned cap
  * (what a Stan-free Prophet stand-in would do) and (b) ground truth,
  * on noise-free logistic-growth series across three regimes.
  *
  * The measured conclusion this spec pins: the dominant forecast-error
  * source is the shared cap heuristic (2·max(y)+$1), not the link —
  * the rational link stays within 15% of ground truth on 8-step
  * horizons in every regime, and on steep ramps it is CLOSER to truth
  * than the logit link under the same cap (which overshoots ~50%).
  * exp/ln here is test-only; the engine path stays integer-exact so
  * the DuckDB oracle replays it bit-for-bit (q110/q114/q121).
  */
class SaturatingLinkSpec extends AnyFunSuite {

  private def logistic(cap: Double, a: Double, b: Double)(x: Double): Double =
    cap / (1 + math.exp(-(a + b * x)))

  /** Logit-link OLS under the engine's own cap pin (2·max(cents)+100). */
  private def logitFit(pts: Seq[(Double, Double)]): Double => Double = {
    val capCents = 2L * pts.map { case (_, y) =>
      (BigDecimal(y) * 100).toLong.max(0L) }.max + 100L
    val cap = capCents / 100.0
    val zs = pts.map { case (x, y) => (x, math.log(y / (cap - y))) }
    val n = zs.size.toDouble
    val sx = zs.map(_._1).sum; val sy = zs.map(_._2).sum
    val sxx = zs.map(p => p._1 * p._1).sum
    val sxy = zs.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    x => cap / (1 + math.exp(-(icept + slope * x)))
  }

  // (a, b, cap, horizon-truth tolerance, vs-logit tolerance)
  private val regimes = Seq(
    ("mid-regime", -2.0, 0.10, 1000.0, 0.15, 0.30),
    ("steep ramp", -4.0, 0.20, 1000.0, 0.15, 0.45),
    ("slow", -1.0, 0.03, 500.0, 0.10, 0.10))

  for ((label, a, b, cap, tolTruth, tolLogit) <- regimes)
    test(s"sat link tracks logistic growth within ${(tolTruth * 100).toInt}% ($label)") {
      val xs = (0 until 30).map(_.toDouble)
      val ys = xs.map(x => BigDecimal(logistic(cap, a, b)(x))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val obs = xs.zip(ys).map { case (x, y) => Obs("s", x, y) }
      val fitted = SegmentForecast.fitSegment(obs,
        grid = Seq(ModelSpec("sat", 0)), holdout = 4, horizon = 8)
      val logit = logitFit(xs.zip(ys))
      val errs = fitted.forecast.zipWithIndex.map { case (pe, i) =>
        val x = xs.last + i + 1
        val truth = logistic(cap, a, b)(x)
        (math.abs(pe - truth) / truth, math.abs(pe - logit(x)) / logit(x))
      }
      val maxTruth = errs.map(_._1).max
      val maxLogit = errs.map(_._2).max
      assert(maxTruth <= tolTruth,
        f"$label: max rel error vs ground truth $maxTruth%.4f > $tolTruth")
      assert(maxLogit <= tolLogit,
        f"$label: max rel divergence vs logit-link fit $maxLogit%.4f > $tolLogit")
    }

  test("steep ramp: the shared cap pin dominates — rational link beats logit there") {
    val (a, b, cap) = (-4.0, 0.20, 1000.0)
    val xs = (0 until 30).map(_.toDouble)
    val ys = xs.map(x => BigDecimal(logistic(cap, a, b)(x))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val obs = xs.zip(ys).map { case (x, y) => Obs("s", x, y) }
    val fitted = SegmentForecast.fitSegment(obs,
      grid = Seq(ModelSpec("sat", 0)), holdout = 4, horizon = 8)
    val logit = logitFit(xs.zip(ys))
    val (engErr, logitErr) = fitted.forecast.zipWithIndex.map { case (pe, i) =>
      val x = xs.last + i + 1
      val truth = logistic(cap, a, b)(x)
      (math.abs(pe - truth) / truth, math.abs(logit(x) - truth) / truth)
    }.unzip
    assert(engErr.max < logitErr.max,
      f"engine ${engErr.max}%.4f should beat logit ${logitErr.max}%.4f under the pinned cap")
  }
}
