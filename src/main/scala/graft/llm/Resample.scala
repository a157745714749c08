package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Systematic (low-variance) weighted resampling — draw EXACTLY `m`
  * items with replacement, each item's multiplicity within 1 of its
  * exact expectation m·wᵢ/W. This is the sampler particle filters and
  * data-mixture builders reach for when multinomial draws are too
  * noisy: a 2-epoch domain budget realized by multinomial sampling
  * over-draws some documents 5×; systematic resampling pins every
  * document to ⌊e⌋ or ⌈e⌉ of its expectation e.
  *
  * Deterministic by construction — NO RNG to ship: targets sit at the
  * stride midpoints Tⱼ = (2j+1)·W/(2m), j = 0..m−1, over the cumulative
  * weight axis in a caller-fixed total order (the id), and item i's
  * multiplicity is the number of targets inside its cumulative span:
  *
  *   multᵢ = nb(cumᵢ) − nb(cumᵢ − wᵢ),
  *   nb(c) = (2·m·c + W − 1) div (2·W)   — # targets strictly below c.
  *
  * Everything is exact BIGINT (the q85/q278 discipline), so an external
  * engine replays every draw bit-for-bit. Overflow bound: 2·m·W must
  * fit a signed long → m·W < 2⁶², far past any realistic (draw count ×
  * corpus tokens) product at bench scale; a 100 TB corpus with m in the
  * billions would move the same formula to DECIMAL(38,0).
  *
  * Scale shape: the cumulative axis comes from
  * [[ShardBalance.globalOrderStats]] — the two-phase range-exchange
  * prefix sum, NO single-partition window — then the multiplicity is a
  * per-row closed form: one range exchange + one broadcast join, linear
  * end to end. Items with multᵢ = 0 are filtered, so the output is at
  * most min(n, m) rows.
  */
object Resample {

  /** @param docs      input frame
    * @param idCol     unique id column — the total order of the
    *                  cumulative axis (ties would make draws ambiguous)
    * @param weightCol non-negative integer weight; rows with weight
    *                  ≤ 0 can never be drawn and are dropped up front
    * @param m         number of draws (> 0)
    * @return (idCol, weight, mult) — only rows drawn at least once */
  def systematic(docs: DataFrame, idCol: String, weightCol: Column,
      m: Long, nRangeParts: Int = 32): DataFrame = {
    require(m > 0, "systematic: m must be > 0")
    val base = docs.select(col(idCol), weightCol.cast(LongType).as("n_tok"))
      .filter(col("n_tok") > 0)
    ShardBalance.globalOrderStats(base, Seq(col(idCol)), nRangeParts)
      .withColumn("mult",
        expr(s"(2 * ${m}L * cum + total - 1) DIV (2 * total)" +
          s" - (2 * ${m}L * (cum - n_tok) + total - 1) DIV (2 * total)"))
      .filter(col("mult") > 0)
      .select(col(idCol), col("n_tok").as("weight"), col("mult"))
  }
}
