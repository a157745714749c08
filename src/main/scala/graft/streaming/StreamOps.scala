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
    val tsName = if (schema.fieldNames.contains("ts")) "ts" else "timestamp"
    val agg = events
      // integer `div`: epoch-nanos overflow double precision
      .withColumn("ts_ts", timestamp_micros(expr(s"$tsName div 1000")))
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

  final case class SessionEvent(user_id: Long, ts_micros: Long, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long)

  /** Custom per-key state: gap-based sessionization via
    * flatMapGroupsWithState (SURVEY: KeyValueGroupedDataset custom
    * state). Events for a user belong to one session while gaps stay
    * under `gapMicros`; a larger gap closes the session and emits it.
    * Works identically over a stream (Append mode + timeout) or, as
    * here, a bounded batch driven synchronously.
    *
    * Scale: state is O(1) per active user key, partitioned by user —
    * the standard streaming-sessionization layout.
    */
  def sessionize(spark: SparkSession, events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMicros: Long): org.apache.spark.sql.Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        val sorted = rows.toSeq.sortBy(_.ts_micros)
        val out = scala.collection.mutable.ListBuffer[SessionOut]()
        var st = state.getOption
        sorted.foreach { e =>
          st match {
            case Some(s) if e.ts_micros - s.last <= gapMicros =>
              st = Some(s.copy(last = e.ts_micros, n = s.n + 1))
            case Some(s) =>
              out += SessionOut(user, s.start, s.last, s.n)
              st = Some(SessionState(e.ts_micros, e.ts_micros, 1))
            case None =>
              st = Some(SessionState(e.ts_micros, e.ts_micros, 1))
          }
        }
        st.foreach(state.update)
        out.iterator
      }
  }
}
