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

  /** Sign-bit count that holds expected cell occupancy at `target`
    * as the corpus grows: bits = ceil(log2(n / target)), clamped to
    * [4, min(20, dim)]. This is the scale knob the SemDeDup paper turns
    * through its k-means k (k grows with n so per-cluster pairwise work
    * stays bounded): with occupancy pinned, within-cell pair volume is
    * n·target/2 — LINEAR in n — instead of n²/2^bits. Measured: fixed
    * 8 bits went 420× super-linear at 100× data (633 s); occupancy-held
    * bits restore linearity. Finer cells trade recall exactly like a
    * larger k does in the paper — the neighborhoods it splits are the
    * knob's documented approximation. */
  def signBitsFor(n: Long, targetOccupancy: Int = 64, dim: Int = 64): Int = {
    // integer-exact ceil(log2(ceil(n / target))): a float log2 can land
    // on either side of a power-of-two boundary depending on the libm,
    // and the DuckDB oracle (q122) must derive the SAME bit count
    // overflow-safe ceil-div (n + t - 1 wraps negative near Long.MaxValue)
    val cells = n / targetOccupancy + (if (n % targetOccupancy == 0) 0 else 1)
    val raw = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, cells - 1))
    math.max(4, math.min(math.min(20, dim), raw))
  }

  /** [[dedup]] with the sign-bit count derived from the corpus size —
    * the 100 TB entry point (one metadata-only count, then the same
    * plan). */
  def dedupAuto(embeddings: DataFrame, tau: Double,
      targetOccupancy: Int = 64): DataFrame =
    dedup(embeddings, tau, signBitsFor(embeddings.count(), targetOccupancy))

  /** Per-item verdict over `embeddings(vec_id, embedding)`:
    * `kept = 1` iff no same-cell neighbor with a smaller vec_id has
    * cosine >= tau. Two-phase arithmetic: every within-cell pair is
    * pruned by the codegen'd double kernel ([[ArrayKernels.dotArr]])
    * at `tau - margin`, and only survivors pay the exact-integer
    * dot/norm (floor(v·2²⁰) quantized longs, shared with the ANN
    * paths) that makes the tau boundary bit-reproducible across
    * engines AND partitionings. The double prefilter tracks the TRUE
    * cosine to ~1e-12, so completeness needs the margin to dominate
    * the quantized-vs-true cosine drift. That drift is NORM-DEPENDENT:
    * first-order, |cos_q − cos| ≤ 2·2⁻²⁰·√dim·(1/|a| + 1/|b|) + O(ε²)
    * (per-element floor error ≤ 1 on a 2²⁰ grid, accumulated over the
    * dot and both norms), so a fixed 1e-3 margin silently loses pairs
    * once norms shrink below ~0.5 at dim 64 (r13 advisor finding).
    * The margin is therefore computed PER PAIR from dim and the two
    * double norms — 2·2⁻²⁰·dim·(1/|a| + 1/|b|), a further √dim-factor
    * conservative over the bound — instead of assuming a unit-norm
    * contract; small-norm vectors just widen their own prefilter
    * (zero-norm degenerates to pass-through, still correct). Survivors
    * are re-checked exactly, so the margin affects pruning cost only,
    * never results — bit-identical to the single-phase integer version
    * (spec-asserted), while the hot O(pairs) loop stays in whole-stage
    * codegen. */
  def dedup(embeddings: DataFrame, tau: Double, signBits: Int = 8): DataFrame = {
    val base = embeddings.select(
      col("vec_id"), col("embedding"),
      signCell(col("embedding"), signBits).as("cell"),
      Ann.norm2Exact(col("embedding")).as("n2"),
      sqrt(graft.functions.ArrayKernels.dotArr(col("embedding"), col("embedding")))
        .as("nd"))
    val a = base.select(col("cell"), col("vec_id").as("aid"),
      col("embedding").as("ae"), col("n2").as("an2"), col("nd").as("nda"))
    val b = base.select(col("cell"), col("vec_id").as("bid"),
      col("embedding").as("be"), col("n2").as("bn2"), col("nd").as("ndb"))
    // bucket-local pairs only: the join key is the cell, so the shuffle
    // is one hash-partition of each side and no all-pairs blowup exists
    val margin = lit(2.0 * math.pow(2, -20)) * size(col("ae")).cast("double") *
      (lit(1.0) / col("nda") + lit(1.0) / col("ndb"))
    val prior = a.join(b, Seq("cell"))
      .filter(col("aid") < col("bid"))
      .filter(graft.functions.ArrayKernels.dotArr(col("ae"), col("be")) >=
        (col("nda") * col("ndb")) * (lit(tau) - margin))
      .withColumn("cosine",
        Ann.cosineFrom(Ann.dotExact(col("ae"), col("be")), col("an2"), col("bn2")))
      .filter(col("cosine") >= tau)
      .groupBy(col("bid").as("vec_id"))
      .agg(max(col("cosine")).as("max_prior_cos"))
    base.join(prior, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("max_prior_cos").isNull, 1).otherwise(0).as("kept"),
        round(col("max_prior_cos"), 6).as("max_prior_cos"))
  }
}
