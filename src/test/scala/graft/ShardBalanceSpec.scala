package graft

import org.apache.spark.sql.functions._
import graft.llm.{ShardBalance, TextStats}

/** Token-balanced sharding: the serpentine deal over the distributed
  * two-phase global rank must (a) produce ranks identical to a naive
  * global row_number regardless of how many range partitions the
  * exchange used, (b) balance token totals far better than hash
  * sharding on the same corpus, and (c) keep the spread within one
  * document's tokens (the serpentine pairing bound, asserted
  * empirically). */
class ShardBalanceSpec extends SparkTestBase {

  private lazy val docs = graft.util.Tables.t(spark, sfDir, "documents")
  private def tok = TextStats.tokenCount(col("text"))

  test("assignment is invariant to the range-partition count") {
    val a4 = ShardBalance.assign(docs, "doc_id", tok, 16, nRangeParts = 4)
      .orderBy("doc_id").collect().toSeq
    val a32 = ShardBalance.assign(docs, "doc_id", tok, 16, nRangeParts = 32)
      .orderBy("doc_id").collect().toSeq
    val a1 = ShardBalance.assign(docs, "doc_id", tok, 16, nRangeParts = 1)
      .orderBy("doc_id").collect().toSeq
    assert(a4 === a32)
    assert(a4 === a1) // nRangeParts = 1 IS the naive global rank
  }

  test("token spread beats hash sharding and stays within one max document") {
    val assigned = ShardBalance.assign(docs, "doc_id", tok, 16)
    val audit = ShardBalance.audit(assigned).collect()
    assert(audit.length === 16)
    val spread = audit.head.getAs[Long]("spread")
    val maxDoc = assigned.agg(max("n_tok")).collect().head.getLong(0)
    assert(spread <= maxDoc,
      s"serpentine spread $spread exceeds max document $maxDoc")
    // hash sharding's token spread on the same corpus, same shard count
    val hashed = assigned
      .withColumn("hshard", pmod(xxhash64(col("doc_id")), lit(16)))
      .groupBy("hshard").agg(sum("n_tok").as("tokens"))
      .agg((max("tokens") - min("tokens")).as("spread"))
      .collect().head.getAs[Long]("spread")
    assert(spread < hashed,
      s"serpentine spread $spread not better than hash spread $hashed")
  }

  test("globalOrderStats matches the naive single-partition window") {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), tok.cast("long").as("n_tok"))
    val got = ShardBalance.globalOrderStats(base,
        Seq(col("n_tok").desc, col("doc_id")), nRangeParts = 7)
      .select("doc_id", "r", "cum", "total")
      .orderBy("doc_id").collect().toSeq
    val w = Window.orderBy(col("n_tok").desc, col("doc_id"))
    val naive = base
      .withColumn("r", row_number().over(w).cast("long") - 1)
      .withColumn("cum",
        sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum("n_tok").over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("doc_id", "r", "cum", "total")
      .orderBy("doc_id").collect().toSeq
    assert(got === naive)
  }

  test("globalNtile matches Spark's ntile, including chained calls") {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), tok.cast("long").as("len"))
    for (k <- Seq(2, 5, 7)) {
      // chained twice on purpose: the second call's input is itself a
      // multi-stage plan, the regime where un-pinned range exchanges
      // sampled different boundaries per consumer and corrupted ranks
      // (the q221 sf0.1 regression this spec pins)
      val step1 = ShardBalance.globalNtile(base,
        Seq(col("len").desc, col("doc_id")), k, "s1", nRangeParts = 5)
      val got = ShardBalance.globalNtile(step1,
          Seq(col("len"), col("doc_id")), k, "s2", nRangeParts = 5)
        .select("doc_id", "s1", "s2").orderBy("doc_id").collect().toSeq
      val naive = base
        .withColumn("s1", ntile(k).over(
          Window.orderBy(col("len").desc, col("doc_id"))).cast("long"))
        .withColumn("s2", ntile(k).over(
          Window.orderBy(col("len"), col("doc_id"))).cast("long"))
        .select("doc_id", "s1", "s2").orderBy("doc_id").collect().toSeq
      assert(got === naive, s"k=$k")
    }
    // n < k: every row its own front-loaded bucket 1..n
    val tiny = docs.limit(3).select(col("doc_id"),
      lit(1L).as("len"))
    val gotTiny = ShardBalance.globalNtile(tiny,
        Seq(col("doc_id")), 5, "s", nRangeParts = 2)
      .orderBy("doc_id").select("s").collect().map(_.getLong(0)).toSeq
    assert(gotTiny === Seq(1L, 2L, 3L))
  }

  test("globalNtile == ntile by property over random (n, k, duplicates)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(16L)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(9)
      // duplicate-heavy values: the tie-broken total order (v, id) is
      // the contract under test
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(7).toLong))
      val df = rows.toDF("id", "v")
      val got = ShardBalance.globalNtile(df,
          Seq(col("v"), col("id")), k, "b", nRangeParts = 1 + rnd.nextInt(6))
        .orderBy("id").select("b").collect().map(_.getLong(0)).toSeq
      val want = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .orderBy("id").select("b").collect().map(_.getLong(0)).toSeq
      assert(got == want, s"trial $trial n=$n k=$k")
    }
  }

  test("every document is assigned exactly once, shards cover 0..n-1") {
    val assigned = ShardBalance.assign(docs, "doc_id", tok, 16)
    assert(assigned.count() === docs.count())
    assert(assigned.select("doc_id").distinct().count() === docs.count())
    val shards = assigned.select("shard").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(shards === (0 until 16))
  }
}
