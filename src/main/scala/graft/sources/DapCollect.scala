package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** DAP/Janus collection orchestration (reference: jobs/dap-collector/
  * dap_collector/main.py:33-150): per (task, interval) the collector
  * shells out to a `collect` binary, parses its stdout into a result
  * row, and appends all rows to a table. The subprocess loop is
  * inherently driver-side (the binary talks to a leader over the
  * network); Spark takes over at the resulting DataFrame.
  *
  * Semantics ported:
  *  - interval generation: floor-align the window start to the interval
  *    length, emit every full interval inside [from, until)
  *    (main.py:137-143);
  *  - bounded parallelism over a shared job queue (main.py:121-148:
  *    10 workers on an asyncio queue) → fixed thread pool here;
  *  - per-collection timeout kills the subprocess and records a TIMEOUT
  *    row instead of failing the run (main.py:66-80);
  *  - exit-code-1 with the known "batch is invalid" stderr becomes the
  *    BATCH TOO SMALL marker; any other failure is recorded verbatim
  *    (main.py:84-92);
  *  - stdout parse: "Aggregation result:" (sum → single element,
  *    countvec/sumvec → int list) and "Number of reports:"
  *    (main.py:93-114);
  *  - plus a retry knob (transient leader errors re-run the subprocess)
  *    — additive over the reference, which one-shots each interval.
  */
object DapCollect {

  final case class CollectTask(taskId: String, metricType: String,
      vdaf: String, vdafArgs: Seq[(String, String)])

  final case class CollectResult(task_id: String, metric_type: String,
      slot_start: Long, collection_duration: Double,
      report_count: Option[Long], value: Seq[Long], error: Option[String])

  val resultSchema: StructType = StructType(Seq(
    StructField("task_id", StringType, nullable = false),
    StructField("metric_type", StringType, nullable = false),
    StructField("slot_start", LongType, nullable = false),
    StructField("collection_duration", DoubleType, nullable = false),
    StructField("report_count", LongType, nullable = true),
    StructField("value", ArrayType(LongType), nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Floor-aligned interval starts: every `intervalLength`-sized slot
    * fully inside [from, until) (main.py:137-143). */
  def intervalStarts(from: Long, until: Long, intervalLength: Long): Seq[Long] = {
    require(intervalLength > 0, "intervalLength must be positive")
    val first = (from / intervalLength) * intervalLength match {
      case s if s < from => ((from + intervalLength - 1) / intervalLength) * intervalLength
      case s => s
    }
    Iterator.iterate(first)(_ + intervalLength)
      .takeWhile(_ + intervalLength <= until).toSeq
  }

  /** The collect CLI argument list for one (task, interval) —
    * main.py:16 CMD shape, as an exec arg vector (no shell). */
  def collectArgs(binary: String, task: CollectTask, slotStart: Long,
      duration: Long): Seq[String] =
    Seq(binary, "--task-id", task.taskId, "--vdaf", task.vdaf) ++
      task.vdafArgs.flatMap { case (k, v) => Seq(s"--$k", v) } ++
      Seq("--batch-interval-start", slotStart.toString,
        "--batch-interval-duration", duration.toString)

  /** Run one collection subprocess and parse its output
    * (main.py:33-114). Never throws on collection failure — errors
    * become rows, so one bad interval can't sink a day's sweep. */
  def collectOnce(binary: String, task: CollectTask, slotStart: Long,
      duration: Long, timeoutMillis: Long = 100000L,
      attempts: Int = 1): CollectResult = {
    val t0 = System.nanoTime()
    def elapsed = (System.nanoTime() - t0) / 1e9
    var attempt = 0
    var last: CollectResult = null
    while (attempt < attempts) {
      attempt += 1
      val pb = new ProcessBuilder(
        collectArgs(binary, task, slotStart, duration): _*)
      try {
        val proc = pb.start()
        val finished = proc.waitFor(timeoutMillis,
          java.util.concurrent.TimeUnit.MILLISECONDS)
        if (!finished) {
          proc.destroyForcibly()
          last = CollectResult(task.taskId, task.metricType, slotStart,
            elapsed, None, Seq.empty, Some("TIMEOUT"))
        } else {
          val stdout = new String(proc.getInputStream.readAllBytes, "UTF-8")
          val stderr = new String(proc.getErrorStream.readAllBytes, "UTF-8")
          last =
            if (proc.exitValue == 1) {
              val err =
                if (stderr.contains("The number of reports included in the batch is invalid"))
                  "BATCH TOO SMALL"
                else s"UNHANDLED ERROR: $stderr"
              CollectResult(task.taskId, task.metricType, slotStart,
                elapsed, None, Seq.empty, Some(err))
            } else parseStdout(task, slotStart, elapsed, stdout)
        }
      } catch {
        case e: java.io.IOException =>
          last = CollectResult(task.taskId, task.metricType, slotStart,
            elapsed, None, Seq.empty, Some(s"EXEC ERROR: ${e.getMessage}"))
      }
      if (last.error.isEmpty || last.error.contains("BATCH TOO SMALL")) return last
    }
    last
  }

  private def parseStdout(task: CollectTask, slotStart: Long,
      duration: Double, stdout: String): CollectResult = {
    var value: Seq[Long] = Seq.empty
    var reports: Option[Long] = None
    stdout.linesIterator.filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("Aggregation result:")) {
        val body = line.substring("Aggregation result:".length).trim
        value = task.vdaf match {
          case "countvec" | "sumvec" =>
            body.stripPrefix("[").stripSuffix("]").split(",")
              .map(_.trim.toLong).toSeq
          case "sum" => Seq(body.toLong)
          case other => throw new IllegalArgumentException(s"Unknown VDAF: $other")
        }
      } else if (line.startsWith("Number of reports:")) {
        reports = Some(line.split("\\s+").last.trim.toLong)
      } else if (line.startsWith("Interval ")) {
        // start/end/length — irrelevant for time-interval queries
      } else {
        throw new IllegalStateException(s"UNHANDLED OUTPUT LINE: $line")
      }
    }
    CollectResult(task.taskId, task.metricType, slotStart, duration,
      reports, value, None)
  }

  /** Sweep every interval of [from, until) for each task with a bounded
    * worker pool (main.py:121-148), returning one row per (task,
    * interval) in deterministic (task, slot) order. */
  def collectMany(binary: String, tasks: Seq[CollectTask], from: Long,
      until: Long, intervalLength: Long, workers: Int = 10,
      timeoutMillis: Long = 100000L, attempts: Int = 1): Seq[CollectResult] = {
    val jobs = for {
      task <- tasks
      slot <- intervalStarts(from, until, intervalLength)
    } yield (task, slot)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(workers, jobs.size)))
    try {
      val futures = jobs.map { case (task, slot) =>
        pool.submit(new java.util.concurrent.Callable[CollectResult] {
          def call(): CollectResult =
            collectOnce(binary, task, slot, intervalLength, timeoutMillis, attempts)
        })
      }
      futures.map(_.get())
    } finally pool.shutdown()
  }

  /** Results → DataFrame in the BQ table shape (main.py:166-181
    * ensure_table schema, minus the wall-clock collection_time column —
    * nondeterministic, callers add it at write time if needed). */
  def toDf(spark: SparkSession, results: Seq[CollectResult]): DataFrame = {
    val rows = results.map { r =>
      Row(r.task_id, r.metric_type, r.slot_start, r.collection_duration,
        r.report_count.map(Long.box).orNull, r.value, r.error.orNull)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), resultSchema)
  }
}
