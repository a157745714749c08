package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: touch every table and run one representative query so the
    // first timed query doesn't absorb JVM/codegen/scan-init costs.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { n =>
      try spark.read.parquet(s"$sfDir/$n.parquet").count()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // min of 2 runs per query: reports steady-state cost, not whichever
    // query happened to absorb a GC pause / JIT recompile. On small
    // executors (slow total runtime) fall back to a single pass.
    val runs = if (cpus.toInt >= 16) 2 else 1
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // 4-decimal (0.1 ms) values keep the one-line JSON under ~3 KB so it
    // fits whole inside the driver's stdout-tail capture window; full
    // double precision buys nothing at bench granularity. Locale.ROOT:
    // "%.4f" must never emit a comma decimal separator.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver captures only a stdout *tail*, which truncates the one-line
    // JSON mid-string; persist the full payload to a file it can read whole.
    val out = java.nio.file.Path.of(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json"))
    java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    println(json)
    println(s"bench_out=${out.toAbsolutePath}")
    spark.stop()
  }
}
