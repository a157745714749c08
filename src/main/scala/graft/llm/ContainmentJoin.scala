package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered exact containment join (the AllPairs/PPJoin family,
  * Bayardo et al. 2007; Xiao et al. 2008): find ordered pairs (a, b)
  * with containment(a→b) = |S(a) ∩ S(b)| / |S(a)| ≥ t, without the
  * naive shingle self-join whose volume is Σ_s df(s)² — quadratic in
  * corpus size under a fixed vocabulary.
  *
  * Prefix theorem: if b misses more than (1−t)·|S(a)| of a's shingles,
  * containment < t; so any qualifying b shares at least one of a's
  * ⌊(1−t)·|S(a)|⌋+1 RAREST shingles (the prefix, under the global-df
  * ordering). Candidates = prefix-shingles(a) ⋈ all-shingles(b) —
  * complete by construction, and the join blocks are the rare tail of
  * the df distribution instead of the whole corpus.
  *
  * The exact intersection is then computed per candidate pair with
  * array_intersect over the two docs' (sorted, distinct) shingle
  * arrays — per-doc state, no second wide join.
  *
  * Scale shape: one df shuffle, one per-doc window for prefix ranks,
  * a candidate join bounded by rare-shingle blocks, and two doc-id
  * equi-joins to attach the arrays. Nothing is ever all-pairs.
  */
object ContainmentJoin {

  /** Ordered pairs (a, b, inter, size_a) with inter·den ≥ size_a·num
    * (containment ≥ num/den), over distinct `shingleW`-shingle sets of
    * `textCol`. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      shingleW: Int, num: Int, den: Int): DataFrame = {
    // shingles become portable 60-bit md5 ids BEFORE any shuffle: the
    // join/intersect key is a long, not a ~35-byte string (identical
    // ids on both engines, so the oracle replays exactly)
    val sets = docs.select(col(idCol).as("id"),
      array_sort(array_distinct(transform(
        TextDedup.shingles(col(textCol), shingleW),
        s => TextDedup.portableHash(s)))).as("sset"))
    val sh = sets.select(col("id"), explode(col("sset")).as("sh"))
    val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    // prefix size ⌊(1-t)·sz⌋+1 = sz - ceil(t·sz) + 1 = sz - ⌈sz·num/den⌉ + 1
    val byRarity = Window.partitionBy("id").orderBy(col("df"), col("sh"))
    val prefixes = sh.join(dfs, "sh")
      .withColumn("rk", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("id")))
      .filter(col("rk") <= col("sz") - expr(s"cast(ceil(sz * $num / $den) as bigint)") + 1)
      .select(col("id").as("a"), col("sh"))
    val cands = prefixes
      .join(sh.select(col("id").as("b"), col("sh")), Seq("sh"))
      .filter(col("a") =!= col("b"))
      .select("a", "b").distinct()
    cands
      .join(sets.select(col("id").as("a"), col("sset").as("sa")), Seq("a"))
      .join(sets.select(col("id").as("b"), col("sset").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        size(col("sa")).cast("long").as("size_a"))
      .filter(col("inter") * den >= col("size_a") * num)
  }
}
