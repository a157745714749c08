package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling — build a training mix with an exact
  * per-source document budget ("data mixing": 30% web, 20% code, …).
  *
  * Selection within a source is by md5(doc id): a stable pseudo-random
  * order that is reproducible across runs, engines and languages (no
  * RNG seeds to ship), so the sampled mix is a pure function of the
  * corpus + quota table. Changing a quota only adds/removes the tail of
  * that one source's ranking — incremental budget changes don't reshuffle
  * already-selected docs.
  *
  * Scale shape: one window shuffle partitioned by source (rank within
  * source), quota table broadcast. Source skew is real at 100 TB (web >>
  * everything); rank-within-partition sorts spill, they don't OOM, and a
  * skewed source can additionally be pre-bucketed by md5 prefix so the
  * sort runs per bucket with a rank offset. No driver-side collection
  * anywhere.
  */
object MixtureSample {

  /** Sample exactly `quota(source)` docs per source (sources absent from
    * the quota map are dropped; short sources yield what they have).
    * Returns (doc_id, source, pick_rank) with pick_rank 1..quota. */
  def sample(spark: SparkSession, docs: DataFrame, quotas: Map[String, Int],
      idCol: String = "doc_id", strataCol: String = "source"): DataFrame = {
    import spark.implicits._
    val q = quotas.toSeq.toDF(strataCol, "quota")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.select(col(idCol), col(strataCol))
      .join(broadcast(q), strataCol)
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= col("quota"))
      .select(col(idCol), col(strataCol), col("pick_rank").cast("bigint"))
  }
}
