package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard score-free combiner for
  * hybrid retrieval: a lexical ranking ([[Bm25.topK]]) and a dense
  * ranking ([[Ann]] cosine top-k) fuse by summed reciprocal ranks,
  * `Σ 1/(k0 + rank)`, which needs no score normalization between the
  * two scorers (BM25 scores and cosines live on incomparable scales —
  * the reason RRF won out in practice for lexical+dense fusion).
  *
  * Determinism: each contribution is ONE IEEE divide `1.0/(k0+rank)`
  * of exact integers, and the fusion adds the lexical term then the
  * dense term in fixed order — both engines replay the identical
  * float ops, so the fused ranking hash-compares exactly.
  *
  * Scale shape: a full-outer equi-join of two (query, doc, rank)
  * lists — each bounded by |queries|·k, never corpus-sized — then one
  * window per query. The upstream rankings carry their own scale
  * stories ([[Bm25]]: one scan pass + pruned window; [[Ann]]: bucketed
  * candidates); fusion adds one tiny join.
  */
object HybridRank {

  /** Fuse a lexical ranking (query_id, rank, doc_id) with a dense
    * ranking (qid, rank, cid) sharing the same query/doc id space.
    *
    * @param k0   the RRF damping constant (60 in the original RRF
    *             formulation; keeps deep-rank contributions comparable)
    * @param topK fused list depth per query
    * @return (query_id, rank, doc_id, lex_rank, dense_rank, rrf) —
    *         absent-side ranks stay NULL and contribute 0 to the score
    */
  def rrf(lex: DataFrame, dense: DataFrame, k0: Int, topK: Int): DataFrame = {
    val l = lex.select(col("query_id"), col("doc_id"),
      col("rank").as("lex_rank"))
    val d = dense.select(col("qid").as("query_id"), col("cid").as("doc_id"),
      col("rank").as("dense_rank"))
    val fused = l.join(d, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("dense_rank")), lit(0.0)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("lex_rank"), col("dense_rank"), round(col("rrf"), 6).as("rrf"))
  }
}
