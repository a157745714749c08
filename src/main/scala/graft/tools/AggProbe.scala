package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: decompose q106's aggregate cost. Not part of the surface. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    o.count()
    def time(name: String)(f: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s ${runs.min}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("count_only") { noop(o.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))) }
    time("count_distinct") { noop(o.groupBy("o_orderpriority")
      .agg(count_distinct(col("o_custkey")).as("cd"))) }
    time("approx_cd") { noop(o.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey")).as("acd"))) }
    time("pct_approx") { noop(o.groupBy("o_orderpriority")
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p"))) }
    time("pct_exact_pair") { noop(o.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.45, 0.55))").as("pp"))) }
    time("pct_exact_two") { noop(o.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.45)").as("a"),
        expr("percentile(o_totalprice, 0.55)").as("b"))) }
    time("all_fused") { noop(o.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count_distinct(col("o_custkey")).as("cd"),
        approx_count_distinct(col("o_custkey")).as("acd"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p"),
        expr("percentile(o_totalprice, array(0.45, 0.55))").as("pp"))) }
    time("no_exact_cd_fused") { noop(o.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("o_custkey")).as("acd"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p"),
        expr("percentile(o_totalprice, array(0.45, 0.55))").as("pp"))) }
    time("split_join") {
      val base = o.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          approx_count_distinct(col("o_custkey")).as("acd"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p"),
          expr("percentile(o_totalprice, array(0.45, 0.55))").as("pp"))
      val cd = o.groupBy("o_orderpriority")
        .agg(count_distinct(col("o_custkey")).as("cd"))
      noop(base.join(cd, Seq("o_orderpriority")))
    }
    spark.stop()
  }
}
