package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sparse-histogram algebra (SURVEY §2.4 A20, reference:
  * /root/reference/jobs/update-orphaning-dashboard/update_orphaning_dashboard/
  * sql/out_of_date_details.sql:28-75 — histograms are sparse
  * {bucket: count} maps, median 1 non-zero bucket; the dense form is
  * 50–100× bigger, so elementwise summation must stay sparse).
  *
  * `sumHistograms` is an Aggregator over map<int,long> columns doing
  * elementwise addition. The buffer stays sparse; partial aggregation
  * (map-side combine) means the shuffle carries one small map per group
  * per partition — the property that makes this viable at 100 TB.
  */
class SumHistograms extends Aggregator[Map[Int, Long], Map[Int, Long], Map[Int, Long]] {
  override def zero: Map[Int, Long] = Map.empty
  override def reduce(b: Map[Int, Long], in: Map[Int, Long]): Map[Int, Long] =
    if (in == null) b else merge(b, in)
  override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  override def finish(b: Map[Int, Long]): Map[Int, Long] = b
  override def bufferEncoder: Encoder[Map[Int, Long]] = Encoders.kryo[Map[Int, Long]]
  override def outputEncoder: Encoder[Map[Int, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object HistogramAgg {

  /** Elementwise sum of sparse map<int,long> histograms. */
  def sumHistograms(histogram: Column): Column =
    udaf(new SumHistograms,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Long]]())
      .apply(histogram)

  /** `count_at0(h)` — the bucket-0 extraction TEMP FUNCTION
    * (out_of_date_details.sql:57-60): count at bucket 0, 0 when absent. */
  def countAt0(histogram: Column): Column =
    coalesce(element_at(histogram, 0), lit(0L))

  /** `enum_nz(h)` — non-zero entries of an enumerated histogram
    * (out_of_date_details.sql:62-75): keep entries with value > 0. */
  def enumNonZero(histogram: Column): Column =
    map_filter(histogram, (_, v) => v > 0)
}
