package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Interpolated Kneser-Ney bigram language model, trained distributed
  * and EXACT — the smoothing that makes an n-gram LM usable as a
  * data-quality / domain-match scorer (the fixed-vocab unigram proxy
  * in [[Surprisal]] filters junk; a KN bigram model ranks fluency).
  *
  * With discount d = 3/4, every interpolated probability is a small
  * rational over integers the cluster can aggregate exactly:
  *
  *   P(w2|w1) = max(c(w1,w2) − d, 0)/c(w1·) + d·N1+(w1,·)/c(w1·) · N1+(·,w2)/T
  *
  * where c(w1·) is the bigram-start count, N1+ are the continuation
  * type counts and T the total number of distinct bigram types. Put
  * over the common denominator 4·c(w1·)·T:
  *
  *   p_num = (4c − 3)·T + 3·N1+(w1,·)·N1+(·,w2)    (c ≥ 1; drop the
  *           first term for unseen bigrams)
  *   p_den = 4·c(w1·)·T
  *
  * Both are BIGINT-sized at any realistic corpus (numerator ≤
  * 4·c·T ~ 2^60 needs c·T > 2^58 — a trillion-type model would move
  * to 128-bit, documented bound). The probability simplex property
  * Σ_w2 p_num = p_den holds as an exact INTEGER identity (proved in
  * KneserNeySpec), which is the kind of invariant a float pipeline can
  * only assert to a tolerance.
  *
  * Scale shape: tokenize per-row → one (doc-window) lead to form
  * bigrams → ONE shuffle on (w1,w2) for counts; the three marginals
  * (start counts, follow types, preceding types) are group-bys of that
  * pre-reduced bigram table (vocab-sized, ≪ corpus); T is a 1-row
  * broadcast. No collect anywhere; the model TABLE stays distributed
  * and joins token-keyed onto scoring traffic exactly like
  * [[Surprisal]]'s unigram join.
  */
object KneserNey {

  /** Train the bigram model: one row per SEEN bigram with the exact
    * rational probability. Columns: w1, w2, c, cw1, n_follow, n_prec,
    * p_num, p_den, p_kn (one correctly-rounded double division). */
  def bigramModel(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val bigrams = bigramCounts(docs, idCol, textCol)
    withProbabilities(bigrams)
  }

  /** Per-(w1, w2) corpus counts from ordered in-document token
    * sequences (documents do not bridge: the last token of a doc pairs
    * with nothing). */
  def bigramCounts(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = docs.select(idCol.as("doc"),
      posexplode(Surprisal.tokens(textCol)))
      .toDF("doc", "pos", "w1")
    val w = Window.partitionBy("doc").orderBy("pos")
    toks.withColumn("w2", lead("w1", 1).over(w))
      .filter(col("w2").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
  }

  /** Per-(doc, w1, w2) in-document bigram instance counts, carrying
    * the named doc-constant attribute columns (e.g. source) through —
    * the scoring-side twin of [[bigramCounts]]: the model aggregates
    * instances globally, a perplexity scorer needs them per document
    * (pre-reduced to distinct bigrams per doc so the model join input
    * is bounded by distinct-bigram volume, not raw token count). */
  def docBigramCounts(docs: DataFrame, idCol: Column, textCol: Column,
      carry: Seq[String] = Nil): DataFrame = {
    val toks = docs.select((Seq(idCol.as("doc")) ++ carry.map(col) :+
      posexplode(Surprisal.tokens(textCol))): _*)
      .withColumnRenamed("col", "w1")
    val w = Window.partitionBy("doc").orderBy("pos")
    toks.withColumn("w2", lead("w1", 1).over(w))
      .filter(col("w2").isNotNull)
      .groupBy((Seq("doc", "w1", "w2") ++ carry).map(col): _*)
      .agg(count(lit(1)).as("tf"))
  }

  /** Incremental maintenance: fold a delta corpus's bigram counts onto
    * an existing count table and re-derive the probabilities. The
    * count table IS the model state — counts are additive, and every
    * marginal (start counts, continuation type counts, T) is a
    * group-by of the merged table, so refreshing a 100 TB-corpus model
    * with a day's delta touches |delta bigrams| + vocab-sized
    * aggregates, never the raw history. The result is EXACTLY the
    * from-scratch model (integer counts — no drift to accumulate),
    * which is what the q263 oracle asserts. */
  def mergeCounts(base: DataFrame, delta: DataFrame): DataFrame =
    base.select("w1", "w2", "c").unionByName(delta.select("w1", "w2", "c"))
      .groupBy("w1", "w2").agg(sum("c").as("c"))

  /** Attach the exact-rational KN probabilities to a (w1, w2, c)
    * bigram-count table. */
  def withProbabilities(bigrams: DataFrame): DataFrame = {
    val starts = bigrams.groupBy("w1")
      .agg(sum("c").as("cw1"), count(lit(1)).as("n_follow"))
    val prec = bigrams.groupBy("w2").agg(count(lit(1)).as("n_prec"))
    val types = bigrams.agg(count(lit(1)).as("t"))
    bigrams.join(starts, "w1").join(prec, "w2")
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c"), col("cw1"),
        col("n_follow"), col("n_prec"),
        ((lit(4L) * col("c") - 3L) * col("t") +
          lit(3L) * col("n_follow") * col("n_prec")).as("p_num"),
        (lit(4L) * col("cw1") * col("t")).as("p_den"))
      .withColumn("p_kn",
        col("p_num").cast(DoubleType) / col("p_den").cast(DoubleType))
  }
}
