package graft.tools
import org.apache.spark.sql.SparkSession
object SkewDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = SkewProbe.amplify(
      spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        .select("event_id","user_id","ts","event_type"), 32)
    val sk = SkewProbe.skewed(ev)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val pj = SkewProbe.plainJoin(sk, SkewProbe.dim(sk))
    pj.collect()
    println(pj.queryExecution.executedPlan.toString.linesIterator.take(50).mkString("\n"))
    spark.stop()
  }
}
