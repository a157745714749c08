package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact unigram-LM surprisal scoring — the CCNet-style
  * "perplexity filter" (Wenzek et al. 2020) re-expressed so the score
  * is deterministic and engine-portable. A float log-likelihood is
  * order- and libm-dependent, so instead of `-log2 p(t) = log2 N -
  * log2 c(t)` we score each token with the INTEGER bit-length proxy
  *
  *   surprisal(t) = bitlen(N) - bitlen(c(t))   (bitlen x = ⌊log2 x⌋+1)
  *
  * which brackets the true surprisal within ±1 bit and is computable
  * exactly in any engine as `length(bin(x))`. Rare tokens score high;
  * a document's mean surprisal (in bits/token) is the quality signal,
  * and the keep decision is cross-multiplied (no division):
  *
  *   keep  ⇔  surprisal_sum · den ≤ num · n_tokens
  *
  * (the mean-bits threshold num/den as an exact rational)
  *
  * Scale shape (100 TB): tokenization is per-row; the unigram count
  * is one shuffle on token; the score join is token-keyed (vocab ≪
  * corpus — Zipf — so AQE broadcasts it when it fits, and it stays an
  * ordinary equi-join when it does not); the doc rollup is pre-reduced
  * by (doc, token) so the join input carries distinct tokens per doc,
  * not raw token instances.
  */
object Surprisal {

  /** Lower-cased alnum word tokens, empties removed (portable:
    * `string_split_regex` in DuckDB matches this exactly). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Per-(doc, token) term frequencies for a document table. */
  private def docTokenCounts(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))

  /** Score every document: (idCol, n_tokens, surprisal_sum, keep).
    * One token shuffle for the LM, one (doc,token) reduce, one join. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      maxMeanBitsNum: Int, maxMeanBitsDen: Int): DataFrame = {
    val dtc = docTokenCounts(docs, idCol, textCol)
    val lm = dtc.groupBy("tok").agg(sum("tf").as("c"))
    val n = lm.agg(sum("c").as("n"))
    val bits = lm.crossJoin(broadcast(n))
      .select(col("tok"),
        (length(bin(col("n"))) - length(bin(col("c")))).cast("long")
          .as("bits"))
    dtc.join(bits, "tok")
      .groupBy(idCol)
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("bits")).as("surprisal_sum"))
      .withColumn("keep",
        col("surprisal_sum") * lit(maxMeanBitsDen) <=
          lit(maxMeanBitsNum) * col("n_tokens"))
  }
}
