package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring spans (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better"): every w-token window
  * that occurs in more than one document marks a duplicated region;
  * per document, overlapping/adjacent duplicated windows merge into
  * maximal spans (gaps-and-islands over window starts). The published
  * row per affected doc is (n_tokens, n_spans, dup_tokens) — integers
  * only, so the oracle replays it exactly.
  *
  * The reference approach builds a suffix array over the whole corpus;
  * the Spark-native shape is window-hash + shuffle: windows explode
  * 1:~len, the cross-doc gram count is one shuffle on the gram, the
  * survivor semi-join is gram-keyed, and the span merge is one per-doc
  * window pass. No all-pairs, no driver state; at 100 TB the gram
  * count is the only wide stage and it partial-aggregates map-side.
  */
object DupSpans {

  /** Per-affected-doc duplicated-span summary for w-token windows. */
  def spans(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      Surprisal.tokens(col(textCol)).as("toks"))
    // Gram keys are chained xxhash64 longs over a let-bound hashed-token
    // array (the q57/q68/q84 pattern): tokens hash ONCE per position,
    // every window key is 8 bytes through the gram shuffle instead of a
    // ~w-word string, and no per-window string is ever allocated.
    // Injective short of a 2^-64 collision: tokens cannot contain the
    // separator, so equal gram strings ⇔ equal hash tuples. (r16;
    // previously concat_ws(" ", slice(...)) built and shuffled the
    // string form.)
    val hsed = toks.select(col(idCol),
      size(col("toks")).cast("long").as("n_tokens"),
      transform(col("toks"), t => xxhash64(t)).as("hs"))
    // sequence(1,0) would DESCEND in Spark — guard short docs to an
    // empty window list instead. The frame feeds both the gram-count
    // aggregate and the survivor semi-join; checkpoint so the
    // explode+hash pass runs once (r16).
    val wins = hsed.select(col(idCol), col("n_tokens"),
        posexplode(when(size(col("hs")) >= w,
          transform(sequence(lit(1), size(col("hs")) - (w - 1)),
            i => xxhash64((0 until w).map(o =>
              element_at(col("hs"), i + lit(o))): _*)))
          .otherwise(array().cast("array<bigint>"))))
      .withColumnRenamed("pos", "start").withColumnRenamed("col", "gram")
      .localCheckpoint()
    val dupGrams = wins.groupBy("gram")
      .agg(count_distinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > 1).select("gram")
    val dup = wins.join(dupGrams, Seq("gram"), "left_semi")
    val byDoc = Window.partitionBy(idCol).orderBy("start")
    dup
      .withColumn("prev_end", max(col("start") + (w - 1)).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("start") > col("prev_end") + 1,
          1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("n_tokens"), col("island"))
      .agg((max(col("start")) + (w - 1) - min(col("start")) + 1)
        .cast("long").as("span_tokens"))
      .groupBy(idCol, "n_tokens")
      .agg(count(lit(1)).as("n_spans"), sum("span_tokens").as("dup_tokens"))
  }
}
