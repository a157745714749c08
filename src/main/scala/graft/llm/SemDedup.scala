package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): partition the embedding space into cells, then drop
  * any item whose cosine similarity to an EARLIER item in the same cell
  * reaches the threshold — one representative (the minimum id) survives
  * per near-duplicate neighborhood.
  *
  * The cell id is a deterministic sign-partition (bit i of the cell = sign
  * of embedding dim i) rather than k-means: same O(n) assignment cost,
  * exactly reproducible across runs/partitionings, and — unlike k-means —
  * oracle-expressible, which lets the whole operator be hash-checked
  * against DuckDB (q87). At 100 TB the shape holds: one shuffle of both
  * sides on the cell id, and the quadratic pair expansion is bounded by
  * the largest cell, never the corpus — `signBits` is the knob that
  * splits hot cells (expected occupancy n / 2^signBits for centered
  * embeddings).
  */
object SemDedup {

  /** Deterministic cell id: bit i set iff embedding[i] > 0. */
  def signCell(emb: Column, signBits: Int = 8): Column =
    (0 until signBits).map { i =>
      when(element_at(emb, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Per-item verdict over `embeddings(vec_id, embedding)`:
    * `kept = 1` iff no same-cell neighbor with a smaller vec_id has
    * cosine >= tau. Cosine uses the exact-decimal dot/norm arithmetic
    * shared with the ANN paths, so the tau boundary is bit-reproducible.
    */
  def dedup(embeddings: DataFrame, tau: Double, signBits: Int = 8): DataFrame = {
    val base = embeddings.select(
      col("vec_id"), col("embedding"),
      signCell(col("embedding"), signBits).as("cell"),
      Ann.norm2Decimal(col("embedding")).as("n2"))
    val a = base.select(col("cell"), col("vec_id").as("aid"),
      col("embedding").as("ae"), col("n2").as("an2"))
    val b = base.select(col("cell"), col("vec_id").as("bid"),
      col("embedding").as("be"), col("n2").as("bn2"))
    // bucket-local pairs only: the join key is the cell, so the shuffle
    // is one hash-partition of each side and no all-pairs blowup exists
    val prior = a.join(b, Seq("cell"))
      .filter(col("aid") < col("bid"))
      .withColumn("cosine",
        Ann.cosineFrom(Ann.dotDecimal(col("ae"), col("be")), col("an2"), col("bn2")))
      .filter(col("cosine") >= tau)
      .groupBy(col("bid").as("vec_id"))
      .agg(max(col("cosine")).as("max_prior_cos"))
    base.join(prior, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("max_prior_cos").isNull, 1).otherwise(0).as("kept"),
        round(col("max_prior_cos"), 6).as("max_prior_cos"))
  }
}
