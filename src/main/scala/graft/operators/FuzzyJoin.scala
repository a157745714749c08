package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Typo-tolerant entity-resolution join — match each dirty record to
  * its best clean counterpart under an edit-distance budget. The
  * text-dedup family (q70-q73, q83) matches near-identical DOCUMENTS
  * by shingle sets; this is the short-string sibling for keys, names
  * and titles, where the right metric is Levenshtein and the right
  * scale trick is BLOCKING: never the O(n²) cross product, but an
  * equi-join on a cheap block key (here: name prefix) that bounds
  * candidates to same-block pairs, then the exact distance filter,
  * then a best-match-per-dirty-record window. The same
  * block → verify → keep-best shape as MinHash-LSH dedup — with the
  * verify step a codegen'd `levenshtein`, no UDF.
  *
  * Scale shape: one shuffle of each side by block key for the
  * candidate equi-join (block keys are low-cardinality-per-key by
  * construction — a hot block is salvageable with [[SkewSalt]]), one
  * window by dirty id for best-match selection. Distance computations
  * happen only inside blocks: candidate count is |block|-bounded, not
  * |clean|-bounded.
  */
object FuzzyJoin {

  /** Resolve `dirty` (id, name) against `clean` (id, name).
    *
    * @param maxDist   edit-distance budget (also the length-difference
    *                  prune inside a block)
    * @param prefixLen block key = first `prefixLen` chars of the name
    *                  (typos inside the prefix fall out of the block —
    *                  the standard blocking recall trade-off; use
    *                  multiple passes with different keys to close it)
    * @return (dirty_id, dirty_name, clean_id, clean_name, dist) — the
    *         single best match per dirty id (lowest dist, ties to the
    *         lowest clean id); dirty ids with no in-budget candidate
    *         are absent
    */
  def resolve(dirty: DataFrame, clean: DataFrame, maxDist: Int,
      prefixLen: Int): DataFrame = {
    val d = dirty.select(col("id").as("dirty_id"),
      col("name").as("dirty_name"),
      substring(col("name"), 1, prefixLen).as("block"))
    val c = clean.select(col("id").as("clean_id"),
      col("name").as("clean_name"),
      substring(col("name"), 1, prefixLen).as("block"))
    val cand = d.join(c, "block")
      .filter(abs(length(col("dirty_name")) - length(col("clean_name")))
        <= maxDist)
      .withColumn("dist", levenshtein(col("dirty_name"), col("clean_name")))
      .filter(col("dist") <= maxDist)
    val best = Window.partitionBy("dirty_id")
      .orderBy(col("dist"), col("clean_id"))
    cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select("dirty_id", "dirty_name", "clean_id", "clean_name", "dist")
  }
}
