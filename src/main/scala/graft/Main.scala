package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.EtlRunner.{JobContext, JobSpec}
import graft.catalog.SchemaId

/** Deployable batch entrypoint — the container story (SURVEY §3.1).
  *
  * The reference ships each job as a Dockerflow container whose
  * entrypoint is a CLI main (e.g.
  * /root/reference/jobs/webcompat-kb/webcompat_kb/main.py:37-138:
  * argparse over --bq-project-id/--write/--no-write, a job registry,
  * sequential execution with collected failures). This is the Spark
  * equivalent: one thin app jar (`sbt package`) launched by
  * `spark-submit --class graft.Main` (cluster) or `java -cp` with the
  * Spark jars appended (local smoke, bin/smoke.sh), flags mirroring
  * the reference's lifecycle:
  *
  * {{{
  * graft.Main --data-dir /data/sf0.01 --out /out \
  *   [--jobs webcompat-kb,llm-prep] [--no-write] [--staging] [--list]
  * }}}
  *
  * Each "job" is a named pack of query plans over the warehouse tables
  * in --data-dir, written through [[graft.catalog.WriteGuard]] (so
  * --no-write dry-runs with the would-be effects logged, and each
  * job's write-targets whitelist is enforced — the reference's
  * `write=False` / `write_targets` contract). Exit code 1 when any
  * job fails, with per-job errors on stderr — the report shape the
  * reference's runner prints.
  *
  * Scale note: the session is obtained via getOrCreate() so
  * spark-submit's cluster conf (master, executors, shuffle partitions)
  * wins; the local[*] fallback only engages when launched standalone.
  */
object Main {

  /** Container-job registry: name → the SparkEntry queries that job
    * materializes (its output tables). Names mirror the reference's
    * jobs/ directories where a counterpart exists. */
  private val jobPacks: Seq[(String, Seq[String])] = Seq(
    // webcompat-kb's scored_site_reports chain (main.py ETL_JOBS)
    "webcompat-kb" -> Seq("q105_webcompat_flagship"),
    // the LLM training-data prep funnel (brief §LLM): dedup →
    // decontaminate → mixture → pack → shard export
    "llm-prep" -> Seq("q70_exact_dedup", "q72_minhash_lsh",
      "q84_decontaminate", "q85_mixture_sample", "q59_sequence_pack",
      "q88_shard_export", "q89_prep_pipeline"),
    // the 160-object SQL corpus: analyze-sweep + fixture execution
    // (needs SPARK_GRAFT_CORPUS_ROOT or the default reference layout)
    "corpus-dag" -> Seq("q108_corpus_sweep", "q109_corpus_exec"),
  )

  def registry(dataDir: String, outDir: String): Seq[JobSpec] =
    jobPacks.map { case (job, qs) =>
      JobSpec(job, Some(qs.toSet), (ctx: JobContext) => {
        qs.foreach { q =>
          val df = SparkEntry.queries(q)(ctx.spark, dataDir)
          val target = ctx.staging.mapId(SchemaId("graft", job.replace('-', '_'), q))
          ctx.guard.writeTable(df, target, s"$outDir/${target.sparkName}",
            SaveMode.Overwrite)
        }
      })
    }

  def main(args: Array[String]): Unit = {
    var dataDir = ""
    var outDir = ""
    var jobs: Seq[String] = Nil
    var write = true
    var staging = false
    var list = false
    var i = 0
    // a valued flag in last position is a usage error, not an
    // ArrayIndexOutOfBoundsException
    def valueOf(flag: String): String = {
      if (i + 1 >= args.length) sys.error(s"missing value for $flag")
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case f @ "--data-dir" => dataDir = valueOf(f); i += 2
        case f @ "--out" => outDir = valueOf(f); i += 2
        case f @ "--jobs" => jobs = valueOf(f).split(",").toSeq.filter(_.nonEmpty); i += 2
        case "--write" => write = true; i += 1
        case "--no-write" => write = false; i += 1
        case "--staging" => staging = true; i += 1
        case "--list" => list = true; i += 1
        case other => sys.error(s"unknown flag: $other")
      }
    }
    if (list) {
      jobPacks.foreach { case (j, qs) => println(s"$j: ${qs.mkString(", ")}") }
      return
    }
    require(dataDir.nonEmpty, "--data-dir is required")
    require(outDir.nonEmpty || !write, "--out is required unless --no-write")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations = Seq(graft.plans.WindowTopKRewrite)

    val report = EtlRunner.run(spark, registry(dataDir, outDir), jobs,
      write = write, staging = staging, log = m => System.err.println(s"[graft] $m"))
    report.succeeded.foreach(j => System.err.println(s"[graft] OK   $j"))
    report.failed.foreach { case (j, err) => System.err.println(s"[graft] FAIL $j: $err") }
    spark.stop()
    if (report.failed.nonEmpty) sys.exit(1)
  }
}
