package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming equivalents of the reference's batch-watermark
  * jobs (SURVEY §2.11: "optionally Trigger.AvailableNow streaming for
  * the rollup"). The reference has no true streaming; this is the
  * Spark-native upgrade path: the same daily-rollup semantics expressed
  * as a watermarked windowed aggregation that can also run as a
  * synchronous batch via processAllAvailable.
  */
object StreamOps {

  /** Windowed event counts as a stream: tumbling window + watermark for
    * late data, memory sink, driven to completion synchronously.
    * Returns the final result as a DataFrame (window bounds flattened).
    *
    * At scale this is readStream over an append-only table/dir with
    * Trigger.AvailableNow and a real sink; the aggregation/watermark
    * semantics are identical.
    */
  def windowedCountsAvailableNow(spark: SparkSession, srcDir: String,
      schema: StructType, windowDur: String = "1 day",
      queryName: String = "stream_counts", globFilter: Option[String] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    val events = globFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
      .parquet(srcDir)
    val tsCol = if (schema.fieldNames.contains("ts")) col("ts") else col("timestamp")
    val agg = events
      .withColumn("ts_ts", timestamp_micros(floor(tsCol.cast("double") / 1000).cast("long")))
      .withWatermark("ts_ts", "1 hour")
      .groupBy(window(col("ts_ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
      .select(to_date(col("window.start")).as("day"), col("event_type"), col("n"))
  }
}
