package graft

import org.apache.spark.sql.functions._
import graft.operators.MisraGries

class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  // skewed stream: key i appears i*10 times, i in 1..20, N = 2100
  private def skewed = (1 to 20).flatMap(i => Seq.fill(i * 10)(i.toString))
    .toDF("key")

  private def summaryOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(MisraGries.summary(col("key"), k).as("mg"))
      .select(explode(col("mg"))).as[(String, Long)].collect().toMap

  test("every true heavy hitter survives, estimates are lower bounds in-band") {
    val k = 8
    val n = 2100
    val mg = summaryOf(skewed, k)
    val exact = (1 to 20).map(i => i.toString -> (i * 10).toLong).toMap
    val thresh = n / (k + 1) // 233
    exact.filter(_._2 > thresh).keys.foreach { key =>
      assert(mg.contains(key), s"heavy hitter $key missing from $mg")
    }
    mg.foreach { case (key, est) =>
      assert(est <= exact(key), s"$key est $est above true ${exact(key)}")
      assert(exact(key) - est <= thresh,
        s"$key err ${exact(key) - est} > $thresh")
    }
    assert(mg.size <= k)
  }

  test("guarantees hold under any partitioning (mergeable reduction)") {
    val k = 5
    for (parts <- Seq(1, 7, 32)) {
      val mg = summaryOf(skewed.repartition(parts), k)
      val exact = (1 to 20).map(i => i.toString -> (i * 10).toLong).toMap
      val thresh = 2100 / (k + 1) // 350
      exact.filter(_._2 > thresh).keys.foreach(key =>
        assert(mg.contains(key), s"parts=$parts missing $key"))
      mg.foreach { case (key, est) =>
        assert(exact(key) - est <= thresh, s"parts=$parts key $key")
      }
    }
  }

  test("uniform stream yields no false certainty: bound still holds") {
    val uni = (1 to 1000).map(i => (i % 50).toString).toDF("key")
    val mg = summaryOf(uni, 4)
    mg.foreach { case (_, est) => assert(est <= 20L + 1000 / 5) }
    assert(mg.size <= 4)
  }
}
