package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.llm.{ContainmentJoin, TextDedup}

/** Randomized completeness check for the r12 ContainmentJoin rewrite
  * (prefix filter + size filter + PPJoin positional upper bound): the
  * prunings are only allowed to drop pairs that CANNOT qualify, so the
  * result must equal the naive all-pairs containment join exactly —
  * including pairs planted as substring cuts, duplicates, and docs
  * short enough to hit the whole-text shingle fallback. Runs at two
  * thresholds: 4/5 (small prefixes) and 1/2 (prefixes near half the
  * set, where a wrong positional bound would actually bite). */
class ContainmentJoinPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 30).map(i => s"w$i")
    def doc(n: Int) = (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")
    val base = (0L until 40L).map(i => i -> doc(5 + rnd.nextInt(35)))
    // planted containments: prefix cuts (a ⊂ b), an exact duplicate,
    // and a short doc (< shingle width -> whole-text fallback)
    val planted = Seq(
      100L -> base(3)._2.split(" ").take(6).mkString(" "),
      101L -> base(7)._2,
      102L -> "w1 w2",
      103L -> (base(11)._2 + " " + base(12)._2))
    base ++ planted
  }

  private def check(seed: Int, num: Int, den: Int): Unit = {
    val docs = corpus(seed).toDF("doc_id", "text")
    val got = ContainmentJoin.pairs(docs, "doc_id", "text",
        shingleW = 3, num = num, den = den)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val sets = docs.select(col("doc_id").as("id"),
      array_distinct(transform(TextDedup.shingles(col("text"), 3),
        s => TextDedup.portableHash(s))).as("sset"))
    val x = sets.select(col("id").as("a"), col("sset").as("sa"))
    val y = sets.select(col("id").as("b"), col("sset").as("sb"))
    val naive = x.crossJoin(y).filter(col("a") =!= col("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        size(col("sa")).cast("long").as("size_a"))
      .filter(col("inter") * den >= col("size_a") * num)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert((naive -- got).isEmpty,
      s"seed=$seed t=$num/$den pruned a QUALIFYING pair: ${naive -- got}")
    assert((got -- naive).isEmpty,
      s"seed=$seed t=$num/$den emitted a non-qualifying pair: ${got -- naive}")
  }

  test("prefix+size+positional pruning is lossless at t=4/5") {
    Seq(1, 2, 3).foreach(check(_, 4, 5))
  }

  test("prefix+size+positional pruning is lossless at t=1/2") {
    Seq(4, 5).foreach(check(_, 1, 2))
  }
}
