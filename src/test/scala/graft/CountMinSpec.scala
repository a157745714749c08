package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMin

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private val d = 3
  private val w = 16

  test("JVM position replays the SQL md5Bucket positions bit-for-bit") {
    val keys = Seq("a", "b", "key-42", "", "日本語")
    val sqlPos = keys.toDF("k").select(col("k"),
      array((0 until d).map { j =>
        pmod(graft.functions.BqShims.md5Bucket(
          concat(col("k"), lit("#" + j))), lit(w.toLong))
      }: _*).as("p")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (k <- keys; j <- 0 until d)
      assert(CountMin.position(k, j, w) == sqlPos(k)(j),
        s"key=$k depth=$j")
  }

  test("estimate is an upper bound for every key, at any partitioning") {
    val keys = (1 to 400).map(i => ((i % 37).toString, i))
    for (parts <- Seq(1, 7)) {
      val df = keys.toDF("key", "x").repartition(parts)
      val cms = df.agg(CountMin.sketch(col("key"), d, w).as("cms"))
      val exact = df.groupBy("key").agg(count(lit(1)).as("n"))
      val rows = exact.crossJoin(cms)
        .select(col("key"), col("n"),
          CountMin.estimate(col("cms"), col("key"), d, w).as("est"))
        .collect()
      assert(rows.length == 37)
      rows.foreach(r =>
        assert(r.getLong(2) >= r.getLong(1), s"under-estimate at ${r.get(0)}"))
    }
  }

  test("sketch contents are merge-order deterministic (cells are sums)") {
    val keys = (1 to 500).map(i => (i % 53).toString).toDF("key")
    val a = keys.repartition(1).agg(CountMin.sketch(col("key"), d, w))
      .head.getSeq[Long](0)
    val b = keys.repartition(11).agg(CountMin.sketch(col("key"), d, w))
      .head.getSeq[Long](0)
    assert(a == b)
    assert(a.sum == 500L * d, "every row of the sketch counts every input")
  }
}
