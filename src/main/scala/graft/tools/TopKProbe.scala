package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: window-top-k vs WindowTopKRewrite wall time. */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warm
    def q = li.withColumn("rn", row_number().over(
        Window.partitionBy("l_suppkey")
          .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))))
      .filter(col("rn") <= 3)
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("window ")(q.write.mode("overwrite").format("noop").save())
    time("rewrite")(graft.plans.WindowTopKRewrite(q)
      .write.mode("overwrite").format("noop").save())
    println("rows window=" + q.count() +
      " rewrite=" + graft.plans.WindowTopKRewrite(q).count())
    spark.stop()
  }
}
