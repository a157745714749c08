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
  * 1:~len, cross-doc duplication is decided on ONE gram-keyed shuffle
  * (two window functions over the same partition key — see below), and
  * the span merge is one per-doc window pass. No all-pairs, no driver
  * state.
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
    // ~w-word string, and no per-window string is ever allocated. (r16;
    // previously concat_ws(" ", slice(...)) built and shuffled the
    // string form.) Collision bound (ADVICE r16): per-pair odds are
    // 2^-64, but the BIRTHDAY bound governs in aggregate — expected
    // cross-gram collisions ≈ G²/2^65 for G distinct grams, i.e. ~1 in
    // 2^25 at G=10^6 (fixture scales: negligible) but ~tens of
    // thousands at the 100 TB design point's G≈10^12, each marking a
    // false duplicate window. A deployment needing exactness there
    // should widen the key to 128 bits (a second differently-seeded
    // hash column, e.g. xxhash64(t, lit(1)) chained the same way) at
    // double the key bytes; the oracle-checked fixtures keep the
    // 64-bit form.
    val hsed = toks.select(col(idCol),
      size(col("toks")).cast("long").as("n_tokens"),
      transform(col("toks"), t => xxhash64(t)).as("hs"))
    // sequence(1,0) would DESCEND in Spark — guard short docs to an
    // empty window list instead.
    val wins = hsed.select(col(idCol), col("n_tokens"),
        posexplode(when(size(col("hs")) >= w,
          transform(sequence(lit(1), size(col("hs")) - (w - 1)),
            i => xxhash64((0 until w).map(o =>
              element_at(col("hs"), i + lit(o))): _*)))
          .otherwise(array().cast("array<bigint>"))))
      .withColumnRenamed("pos", "start").withColumnRenamed("col", "gram")
    // Cross-doc survivor pruning as TWO window passes over ONE
    // gram-keyed exchange (r17): n_docs = running "first row of this
    // doc within the gram" flags, summed over the whole gram partition —
    // exactly count_distinct(doc) per gram. The r16 shape (checkpoint
    // the wins frame, groupBy(gram) count, semi-join back) materialized
    // a corpus-sized (one row per token window) frame in executor
    // storage AND paid the aggregate + semi-join; the stress A/B at 16x
    // documents (worst-case: every window duplicated) measured
    // checkpoint+semi 11.9 s, recompute+semi 18.8 s, this shape 7.8 s —
    // no barrier, single consumer, one exchange. Caveat at 100 TB: a
    // single pathologically hot gram lands in one window task (the
    // aggregate partial-combined; AQE skew-split does not apply to
    // windows) — if a corpus has 10^9-fold repeated windows, the
    // groupBy+semi-join form is the skew-safe fallback.
    val byGramDoc = Window.partitionBy("gram").orderBy(idCol)
    val byGram = Window.partitionBy("gram")
    val dup = wins
      .withColumn("nd",
        when(lag(col(idCol), 1).over(byGramDoc).isNull
          || lag(col(idCol), 1).over(byGramDoc) =!= col(idCol), 1L)
          .otherwise(0L))
      .withColumn("n_docs", sum("nd").over(byGram))
      .filter(col("n_docs") > 1)
      .drop("nd", "n_docs")
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
