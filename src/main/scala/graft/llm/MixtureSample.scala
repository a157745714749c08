package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

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

  /** Temperature-scaled mixture sampling (the sqrt-flattening used to
    * de-skew web-dominated training mixes): source s keeps each doc
    * independently with rate p_s = sqrt(min_n / n_s), so the expected
    * kept count is sqrt(min_n · n_s) — source sizes are flattened to
    * their geometric mean with the smallest source (temperature 2 in
    * the n_s^(1/T) convention; the smallest source keeps everything).
    *
    * Engine-portable by construction: p_s needs no cross-source float
    * sum (min_n is an INTEGER — no order-dependent Σ√n̄ normalizer),
    * one divide + one sqrt, both correctly-rounded IEEE; the per-doc
    * uniform is the md5-derived 60-bit [[TextDedup.portableHash]] of
    * the id scaled by 2⁻⁶⁰ — reproducible in any engine, no RNG state.
    *
    * Scale shape: a tiny per-source count table broadcasts onto one
    * scan pass; keep/drop is a codegen'd per-row predicate. Nothing
    * shuffles but the k-row count agg. */
  def temperatureFlatten(docs: DataFrame, idCol: String = "doc_id",
      strataCol: String = "source"): DataFrame = {
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("n_src"))
    val minN = counts.agg(min(col("n_src")).as("min_n"))
    docs.select(col(idCol), col(strataCol))
      .join(broadcast(counts), strataCol)
      .crossJoin(broadcast(minN))
      .withColumn("p",
        sqrt(col("min_n").cast(DoubleType) / col("n_src").cast(DoubleType)))
      .withColumn("u",
        TextDedup.portableHash(col(idCol).cast(StringType)).cast(DoubleType) /
          lit(1152921504606846976.0d)) // 2^60, exact in double
      .withColumn("keep", col("u") < col("p"))
  }

  /** Per-source audit of [[temperatureFlatten]]: totals, kept counts,
    * kept-id checksums and the applied rate — integer/fixed-double
    * outputs an external engine reproduces bit-for-bit. */
  def temperatureReport(docs: DataFrame, idCol: String = "doc_id",
      strataCol: String = "source"): DataFrame =
    temperatureFlatten(docs, idCol, strataCol)
      .groupBy(col(strataCol), col("n_src"))
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("keep"), col(idCol))).as("min_kept"),
        sum(when(col("keep"), col(idCol)).otherwise(0L)).as("sum_kept"),
        round(max(col("p")), 6).as("rate"))
      .withColumnRenamed("n_src", "n_total")

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
