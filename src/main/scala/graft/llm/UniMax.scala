package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** UniMax epoch-capped budget allocation (Chung et al., ICLR 2023):
  * given per-source token counts n_s, a total training budget B, and a
  * repeat cap of E epochs per source, allocate tokens so every source
  * gets an equal share of B EXCEPT that no source is asked for more
  * than E·n_s tokens — the fair remedy for web-dominated mixtures that
  * temperature flattening ([[MixtureSample.temperatureFlatten]]) only
  * approximates: small sources are consumed up to the epoch cap, and
  * the budget they cannot absorb is re-spread equally over the larger
  * ones.
  *
  * The paper's allocation loop is sequential (smallest source first,
  * re-divide the remainder). It has the classical waterfilling closed
  * form, which is what makes it relational: sort sources by cap
  * c_s = E·n_s ascending, and the capped set is a PREFIX of that order
  * — source at rank k is capped iff c_k·(n−k+1) ≤ B − Σ_{j<k} c_j
  * (its cap fits under the equal split of what is left when it is the
  * smallest remaining). One window pass computes rank + exclusive
  * prefix sums, unpartitioned windows over the same k-row frame find
  * the prefix boundary k* and the capped mass, and every uncapped
  * source gets the integer water level
  * (B − Σ_{j≤k*} c_j) div (n − k*). All arithmetic is exact BIGINT
  * (ranks, prefix sums, one integer division) — bit-identical on any
  * engine, no float accumulation order to disagree about.
  *
  * Scale shape: the waterfilling runs on the PER-SOURCE table — k rows
  * for k sources (tens, not billions) — so its unpartitioned windows
  * are bounded by source cardinality by construction, the same
  * contract as [[ShardBalance]]'s partition-offset fold. The only
  * full-data work is the groupBy(source) token count, a map-side
  * combinable aggregate; the resulting allocation broadcasts back
  * onto the corpus as a per-row sampling rate.
  */
object UniMax {

  /** Per-source allocation table: (source, n_tok, cap, alloc_tok,
    * is_capped, leftover). `counts` must be one row per source with a
    * BIGINT token count column `n_tok`; `budget` is a BIGINT column
    * evaluated over the counts frame — usually an `OVER ()` window
    * aggregate of the counts themselves (e.g.
    * `expr("(sum(n_tok) OVER () * 3) DIV 2")`) or a literal. Keeping
    * it an expression on the SAME frame (rather than a separate 1-row
    * aggregate crossJoined back) is what holds the whole allocation to
    * ONE pass over `counts`' lineage: every boundary scalar (n_src,
    * k*, capped mass, spent) is an unpartitioned window over the k-row
    * table, so the corpus scan behind `counts` is never recomputed.
    * Leftover = B − Σ alloc (integer-division dust + the under-budget
    * case where even B/n exceeds every cap). */
  def allocate(counts: DataFrame, budget: Column, epochCap: Int,
      srcCol: String = "source"): DataFrame =
    allocImpl(counts, budget, epochCap, srcCol, Nil)

  /** [[allocate]] run independently inside each value of `armCol` —
    * the ablation-grid form (q305): one frame holding many
    * counts-tables (e.g. leave-one-domain-out arms), every window
    * below partitioned by arm so each arm waterfills on its own k-row
    * slice. Output gains the arm column; all bounds and exactness
    * guarantees are per-arm unchanged. */
  def allocateGrid(counts: DataFrame, budget: Column, epochCap: Int,
      armCol: String, srcCol: String = "source"): DataFrame =
    allocImpl(counts, budget, epochCap, srcCol, Seq(armCol))

  private def allocImpl(counts: DataFrame, budget: Column, epochCap: Int,
      srcCol: String, partCols: Seq[String]): DataFrame = {
    val parts = partCols.map(col)
    // k-row frame per partition, bounded by source count
    val all = Window.partitionBy(parts: _*)
    val w = Window.partitionBy(parts: _*).orderBy(col("cap"), col(srcCol))
    counts
      .withColumn("cap", col("n_tok") * epochCap)
      .withColumn("b", budget)
      .withColumn("k", row_number().over(w).cast(LongType))
      .withColumn("prefix", coalesce(
        sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_src", count(lit(1)).over(all))
      .withColumn("flag",
        col("cap") * (col("n_src") - col("k") + 1) <= col("b") - col("prefix"))
      .withColumn("kstar",
        coalesce(max(when(col("flag"), col("k"))).over(all), lit(0L)))
      .withColumn("csum",
        coalesce(sum(when(col("flag"), col("cap"))).over(all), lit(0L)))
      .withColumn("lvl",
        when(col("n_src") > col("kstar"),
          expr("(b - csum) DIV (n_src - kstar)")).otherwise(lit(0L)))
      .withColumn("alloc_tok",
        when(col("k") <= col("kstar"), col("cap")).otherwise(col("lvl")))
      .withColumn("is_capped",
        (col("k") <= col("kstar")).cast(IntegerType))
      .withColumn("spent", sum("alloc_tok").over(all))
      .select(partCols.map(col) ++ Seq(col(srcCol), col("n_tok"), col("cap"),
        col("alloc_tok"), col("is_capped"),
        (col("b") - col("spent")).as("leftover")): _*)
      .orderBy(partCols.map(col) :+ col(srcCol): _*)
  }
}
