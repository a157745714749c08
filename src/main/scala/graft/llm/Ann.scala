package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding array<float>, label)`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k for a bounded query set.
  *    The query side must be small (it is broadcast); the corpus side
  *    streams. This is the correctness baseline.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus and queries are
  *    bucketed by an nBits sign-signature, candidates come only from the
  *    query's bucket (plus optional multi-probe neighbors), and exact
  *    cosine re-ranks within buckets. Candidate generation is linear and
  *    the bucket join is an equi-join — the 100 TB path; no crossJoin.
  *
  * Exact-cosine arithmetic: float products are computed in double (exact)
  * and accumulated in decimal, so results are independent of row/partition
  * order — required for the oracle hash-compare and for stable top-k
  * cutoffs at scale.
  */
object Ann {

  private val dec = DecimalType(30, 15)

  /** Fast (order-dependent, ±ulp) double dot product — use as a
    * prefilter with a margin, never for final values. */
  def dotDouble(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Exact order-independent dot product of two float-array columns. */
  def dotDecimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(java.math.BigDecimal.ZERO).cast(dec),
      (acc, x) => (acc + x.cast(dec)).cast(dec))

  /** Squared L2 norm, same exact-decimal scheme. */
  def norm2Decimal(a: Column): Column = dotDecimal(a, a)

  /** Cosine similarity from precomputed decimal dot + norms. */
  def cosineFrom(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast(DoubleType) / (sqrt(n2a.cast(DoubleType)) * sqrt(n2b.cast(DoubleType)))

  /** Exact cosine top-k of `queries` against `corpus` (both shaped
    * (id, embedding)). Queries must be small/broadcastable. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      norm2Decimal(col("embedding")).as("cn2"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      norm2Decimal(col("embedding")).as("qn2"))
    val scored = c.join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("dot", dotDecimal(col("qe"), col("ce")))
      .withColumn("cosine", cosineFrom(col("dot"), col("qn2"), col("cn2")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane weight for (dim i, plane p):
    * uniform in [-0.5, 0.5), derived from xxhash64 — no RNG state, same
    * on every executor. */
  private def planeWeight(i: Column, p: Int): Column =
    (pmod(xxhash64(i, lit(p)), lit(1000000L)).cast(DoubleType) / 1000000.0) - 0.5

  /** nBits-bit sign signature of an embedding against the deterministic
    * hyperplane family. */
  def lshSignature(emb: Column, nBits: Int): Column =
    (0 until nBits).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x.cast(DoubleType) * planeWeight(i, p)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** IVF-style ANN: corpus assigned once to the nearest of `nCells`
    * centroid vectors (deterministic: the lowest-id corpus vectors serve
    * as centroids — a k-means step can refine them without changing the
    * query path); each query probes its `nProbe` nearest cells only and
    * exact cosine re-ranks within them.
    *
    * Scale: assignment is one broadcast pass over the corpus (centroids
    * are tiny); probing turns all-pairs search into an equi-join on
    * cell id over ~nProbe/nCells of the corpus. The inverted-file layout
    * is the same partition-pruning idea as partitioned parquet — a query
    * touches only its cells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val centroids = corpus.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"),
        norm2Decimal(col("embedding")).as("centn2"))
    def nearestCells(side: DataFrame, idCol: String, embCol: String, n: Int): DataFrame = {
      val w = Window.partitionBy(idCol).orderBy(col("cell_cos").desc, col("cell"))
      side.crossJoin(broadcast(centroids))
        .withColumn("cell_cos",
          dotDouble(col(embCol), col("centroid")) /
            (sqrt(norm2Decimal(col(embCol)).cast(DoubleType)) *
              sqrt(col("centn2").cast(DoubleType))))
        .withColumn("cell_rank", row_number().over(w))
        .filter(col("cell_rank") <= n)
        .drop("centroid", "centn2", "cell_cos", "cell_rank")
    }
    val assigned = nearestCells(
      corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"),
        norm2Decimal(col("embedding")).as("cn2")), "cid", "ce", 1)
    val probed = nearestCells(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        norm2Decimal(col("embedding")).as("qn2")), "qid", "qe", nProbe)
    val scored = assigned.join(probed, Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("dot", dotDecimal(col("qe"), col("ce")))
      .withColumn("cosine", cosineFrom(col("dot"), col("qn2"), col("cn2")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("cosine"), 6).as("cosine"))
  }

  /** LSH-bucketed ANN: equi-join on the signature bucket, exact cosine
    * re-rank within buckets, top-k per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      norm2Decimal(col("embedding")).as("cn2"),
      lshSignature(col("embedding"), nBits).as("bucket"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      norm2Decimal(col("embedding")).as("qn2"),
      lshSignature(col("embedding"), nBits).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("dot", dotDecimal(col("qe"), col("ce")))
      .withColumn("cosine", cosineFrom(col("dot"), col("qn2"), col("cn2")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("bucket"), col("rank"), col("cid"),
        round(col("cosine"), 6).as("cosine"))
  }
}
