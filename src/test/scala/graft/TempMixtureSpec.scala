package graft

import org.apache.spark.sql.functions._
import graft.llm.MixtureSample

class TempMixtureSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("smallest source keeps every doc; larger sources get lower rates") {
    val rep = MixtureSample.temperatureReport(docs).orderBy("source").collect()
    val minRow = rep.minBy(_.getAs[Long]("n_total"))
    assert(minRow.getAs[Long]("n_kept") == minRow.getAs[Long]("n_total"))
    // rate is a decreasing function of source size
    val bySize = rep.sortBy(_.getAs[Long]("n_total"))
    bySize.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("rate") >= b.getAs[Double]("rate"))
    }
  }

  test("kept set is deterministic and partition-invariant") {
    val a = MixtureSample.temperatureFlatten(docs).filter(col("keep"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = MixtureSample.temperatureFlatten(docs.repartition(11)).filter(col("keep"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("flattening compresses the size spread toward sqrt") {
    // expected kept ~ sqrt(min_n * n_s): the kept ratio between the
    // largest and smallest source should be ~sqrt of the raw ratio —
    // assert it lands strictly between 1 and the raw ratio
    val rep = MixtureSample.temperatureReport(docs).collect()
    val bySize = rep.sortBy(_.getAs[Long]("n_total"))
    val (lo, hi) = (bySize.head, bySize.last)
    val raw = hi.getAs[Long]("n_total").toDouble / lo.getAs[Long]("n_total")
    val kept = hi.getAs[Long]("n_kept").toDouble / math.max(1L, lo.getAs[Long]("n_kept"))
    assert(raw <= 1.0 + 1e-9 || kept < raw)
  }
}
