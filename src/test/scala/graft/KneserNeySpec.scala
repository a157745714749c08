package graft

import org.apache.spark.sql.functions._

import graft.llm.KneserNey

class KneserNeySpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a dog sat on a log"),
    (4L, "the dog ate"))
    .toDF("doc_id", "text")

  test("bigram counts: in-document sequences, no cross-doc bridging") {
    val c = KneserNey.bigramCounts(corpus, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(c(("the", "cat")) == 2L)
    assert(c(("sat", "on")) == 2L)
    assert(c(("on", "the")) == 1L)
    assert(c(("on", "a")) == 1L)
    // doc 4 ends with 'ate': no bigram ('ate', 'the') beyond doc 2's
    assert(c(("ate", "the")) == 1L)
    // no bridge between doc 1's 'mat' and doc 2's 'the'
    assert(!c.contains(("mat", "the")))
  }

  test("probability simplex: sum of p_num over ALL w2 equals p_den exactly") {
    // Σ_w2 P(w2|w1) = 1 must hold as an INTEGER identity when the
    // unseen-bigram mass λ·Pcont is included: per w1,
    //   Σ_seen [(4c−3)T + 3·Nf·Np(w2)] + Σ_unseen 3·Nf·Np(w2) = 4·cw1·T
    // using Σ_all_w2 Np(w2) = T. Verified by materializing the full
    // w1 × continuation-vocab grid.
    val m = KneserNey.bigramModel(corpus, col("doc_id"), col("text"))
    val t = m.count() // total bigram types (one row per seen bigram)
    val starts = m.select("w1", "cw1", "n_follow").distinct()
    val prec = m.select("w2", "n_prec").distinct()
    val grid = starts.crossJoin(prec)
      .join(m.select(col("w1"), col("w2"), col("c")), Seq("w1", "w2"), "left")
    val perW1 = grid.groupBy("w1", "cw1")
      .agg(sum(
        when(col("c").isNotNull,
          (lit(4L) * col("c") - 3L) * lit(t) +
            lit(3L) * col("n_follow") * col("n_prec"))
          .otherwise(lit(3L) * col("n_follow") * col("n_prec")))
        .as("num_sum"))
      .collect()
    assert(perW1.nonEmpty)
    for (r <- perW1) {
      val w1 = r.getString(0); val cw1 = r.getLong(1)
      assert(r.getLong(2) == 4L * cw1 * t,
        s"w1=$w1: ${r.getLong(2)} != ${4L * cw1 * t}")
    }
  }

  test("hand-checked probability: P(cat|the) on the toy corpus") {
    // 'the' starts bigrams: the-cat x2, the-mat? no ('the mat' ends doc
    // 1 -> 'the','mat' IS a bigram), the-fish, the-dog. cw1(the)=5:
    // the-cat,the-mat,the-cat,the-fish,the-dog. n_follow(the)=4.
    val m = KneserNey.bigramModel(corpus, col("doc_id"), col("text"))
      .filter(col("w1") === "the" && col("w2") === "cat")
      .collect().head
    val t = KneserNey.bigramCounts(corpus, col("doc_id"), col("text")).count()
    assert(m.getAs[Long]("c") == 2L)
    assert(m.getAs[Long]("cw1") == 5L)
    assert(m.getAs[Long]("n_follow") == 4L)
    // 'cat' is preceded only by 'the' -> n_prec = 1
    assert(m.getAs[Long]("n_prec") == 1L)
    assert(m.getAs[Long]("p_num") == (4L * 2 - 3) * t + 3L * 4 * 1)
    assert(m.getAs[Long]("p_den") == 4L * 5 * t)
  }

  test("model is invariant under repartitioning (exact integers)") {
    val a = KneserNey.bigramModel(corpus.repartition(5), col("doc_id"),
      col("text")).orderBy("w1", "w2").collect().toSeq
    val b = KneserNey.bigramModel(corpus.coalesce(1), col("doc_id"),
      col("text")).orderBy("w1", "w2").collect().toSeq
    assert(a == b)
  }
}
