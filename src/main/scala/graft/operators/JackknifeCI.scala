package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Jackknife sum confidence interval — the reference's one true custom
  * UDAF (`udf_js.jackknife_sum_ci(20, ARRAY_AGG(mau))`, used at
  * /root/reference/jobs/desktop-mobile-mau-2020/mobile_mau/
  * forecast_and_actual.sql:74 over 20 id-buckets).
  *
  * Semantics implemented (documented here as the contract):
  *  - input: (bucket, value) pairs, one per id-bucket (missing buckets
  *    count as 0); nBuckets fixed at construction.
  *  - total  T   = Σ value_i
  *  - leave-one-out estimates θ_i = (T - value_i) * n / (n - 1)
  *  - se = sqrt( (n-1)/n * Σ (θ_i - θ̄)² )
  *  - low/high = T ∓ z · se with z = 1.959963984540054 (95% normal).
  *
  * Determinism: the buffer is reduced to a bucket-sorted array before any
  * floating-point accumulation, so results are independent of partition
  * merge order — required both for the oracle hash-compare and for
  * reproducible CI at cluster scale.
  *
  * Scale: the buffer is bounded by nBuckets (20) regardless of input
  * rows; partial aggregation merges tiny maps, so the shuffle carries
  * O(nBuckets) per group.
  */
case class BucketValue(bucket: Long, value: Double)
case class JackknifeResult(total: Double, low: Double, high: Double)

class JackknifeSumCi(nBuckets: Int)
    extends Aggregator[BucketValue, Map[Long, Double], JackknifeResult] {

  private val z = 1.959963984540054

  override def zero: Map[Long, Double] = Map.empty

  override def reduce(b: Map[Long, Double], in: BucketValue): Map[Long, Double] =
    b.updated(in.bucket, b.getOrElse(in.bucket, 0.0) + in.value)

  override def merge(a: Map[Long, Double], b: Map[Long, Double]): Map[Long, Double] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0.0) + v) }

  override def finish(buf: Map[Long, Double]): JackknifeResult = {
    val n = nBuckets
    // bucket-sorted, zero-filled → deterministic accumulation order
    val values = (0 until n).map(i => buf.getOrElse(i.toLong, 0.0)).toArray
    val total = values.sum
    val thetas = values.map(v => (total - v) * n / (n - 1))
    val mean = thetas.sum / n
    val ss = thetas.map(t => (t - mean) * (t - mean)).sum
    val se = math.sqrt(ss * (n - 1) / n)
    JackknifeResult(total, total - z * se, total + z * se)
  }

  override def bufferEncoder: Encoder[Map[Long, Double]] =
    Encoders.kryo[Map[Long, Double]]
  override def outputEncoder: Encoder[JackknifeResult] =
    Encoders.product[JackknifeResult]
}

object JackknifeCI {
  /** Column form: jackknife_sum_ci(nBuckets, bucketCol, valueCol). */
  def jackknifeSumCi(nBuckets: Int)(bucket: Column, value: Column): Column =
    udaf(new JackknifeSumCi(nBuckets), Encoders.product[BucketValue])
      .apply(bucket, value)
}
