package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewSalt

class SkewSaltSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin matches the plain equi-join exactly on skewed data") {
    // heavily skewed fact: 90% of rows share key "hot"
    val fact = (1 to 1000).map(i =>
      (i.toLong, if (i <= 900) "hot" else s"k${i % 7}", i * 1.5))
      .toDF("row_id", "key", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B"), ("k5", "C"))
      .toDF("key", "label")
    val plain = fact.join(dim, Seq("key"))
      .select("row_id", "key", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val salted = SkewSalt.saltedJoin(fact, dim, "key", Seq("row_id"), saltFactor = 8)
      .select("row_id", "key", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._2 == "hot") == 900)
  }

  test("salt actually spreads the hot key across partitions") {
    val fact = (1 to 1000).map(i => (i.toLong, "hot")).toDF("row_id", "key")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8)))
    val nSalts = salted.select("__salt").distinct().count()
    assert(nSalts == 8, s"expected 8 salt values, got $nSalts")
  }
}
