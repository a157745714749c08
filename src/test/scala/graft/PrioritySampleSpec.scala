package graft

import org.apache.spark.sql.functions._
import graft.llm.PrioritySample
import graft.util.Tables.t

class PrioritySampleSpec extends SparkTestBase {
  import spark.implicits._

  test("returns exactly k ranked rows, priorities descending") {
    val out = PrioritySample.sample(
        t(spark, sfDir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 32)
      .select("rank", "priority").as[(Int, Double)].collect()
    assert(out.length === 32)
    assert(out.map(_._1).toSeq === (1 to 32))
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
  }

  test("estimator sums near the true total weight (the DLT property)") {
    val docs = t(spark, sfDir, "documents").select("doc_id", "n_chars")
    val total = docs.agg(sum("n_chars")).as[Long].head().toDouble
    val est = PrioritySample.sample(docs, "doc_id", "n_chars", k = 128)
      .agg(sum("w_hat")).as[Double].head()
    // single deterministic md5 draw, 500 docs: per-realization error
    // decays with k (+50% at k=16, +27% at k=64, +13% at k=128 on this
    // fixture) — assert the k=128 point inside a 25% band
    assert(math.abs(est - total) / total < 0.25,
      s"estimate $est vs total $total")
  }

  test("deterministic across partitionings") {
    val docs = t(spark, sfDir, "documents").select("doc_id", "n_chars")
    def run(df: org.apache.spark.sql.DataFrame) =
      PrioritySample.sample(df, "doc_id", "n_chars", 16)
        .select("rank", "doc_id", "w_hat")
        .as[(Int, Long, Double)].collect().toSeq
    assert(run(docs) === run(docs.repartition(13)))
  }

  test("w_hat is floored at tau for light items") {
    // every sampled item's w_hat >= its own weight and >= nothing less
    // than tau = min sampled priority
    val out = PrioritySample.sample(
        t(spark, sfDir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", 16)
      .select("n_chars", "priority", "w_hat")
      .as[(Long, Double, Double)].collect()
    val tauUpper = out.map(_._2).min // (k+1)-th is <= min sampled priority
    out.foreach { case (w, _, wh) =>
      assert(wh >= w.toDouble)
      assert(wh <= math.max(w.toDouble, tauUpper))
    }
  }

  test("plan takes an ordered limit, not a global sort shuffle") {
    val plan = t(spark, sfDir, "documents").select("doc_id", "n_chars")
      .withColumn("priority",
        PrioritySample.priority(col("doc_id"), col("n_chars")))
      .orderBy(desc("priority"), col("doc_id")).limit(65)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
  }
}
