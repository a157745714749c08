package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev probe: decompose q132's FuzzyJoin cost stage by stage (r17).
  * Not part of the query surface. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    p.count()
    def time(name: String)(f: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s min ${runs.min}%.2f s  first ${runs.head}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val dirty = p.filter(col("id") % 3 === 0)
      .withColumn("pos", (col("id") % (length(col("name")) - 6)) + 5)
      .select(col("id"), expr(
        "concat(substring(name, 1, CAST(pos AS INT)), 'q', " +
          "substring(name, CAST(pos + 2 AS INT)))").as("name"))
    println(s"dirty rows=${dirty.count()}, distinct names=${dirty.select("name").distinct().count()}, " +
      s"clean distinct=${p.select("name").distinct().count()}")
    time("dirty_build") { noop(dirty) }
    time("full_resolve") {
      noop(graft.operators.FuzzyJoin.resolve(dirty, p, maxDist = 2, prefixLen = 4))
    }
    spark.stop()
  }
}
