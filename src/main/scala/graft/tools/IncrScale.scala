package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.TextDedup

/** Dev tool: cost-follows-the-batch evidence for incremental LSH dedup
  * (q117's contract). Builds the persisted (band, pkey)-partitioned
  * signature index over the non-batch corpus, then times ONLY the
  * incremental probe (sign batch + pruned equi-join against the index).
  *
  * Run with a batch modulus that keeps the ABSOLUTE batch size fixed
  * while the corpus scales (ScaleData ids are doc_id*N+k, so mod 5 at
  * 1x and mod 5N at Nx select the same number of batch docs): if probe
  * cost follows the batch, the Nx probe time stays near the 1x time
  * instead of scaling with the corpus.
  *
  * Usage: runMain graft.tools.IncrScale <sfDir> <batchMod>
  */
object IncrScale {
  def main(args: Array[String]): Unit = {
    val Array(dir, modS) = args.take(2)
    val mod = modS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nBatch = docs.filter(col("doc_id") % mod === 0).count()
    val idxDir = java.nio.file.Files.createTempDirectory("incrscale_idx").toString
    // index build is the one-time corpus cost — NOT timed (the daily
    // contract is that it is amortized); xxhash64 family = scale default
    TextDedup.writeSigIndex(
      TextDedup.bandedSignatures(docs.filter(col("doc_id") % mod =!= 0),
        k = 32, bands = 4, shingleW = 3, portable = false),
      idxDir, parts = 8)
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      TextDedup.incrementalCandidates(docs.filter(col("doc_id") % mod === 0),
          spark.read.parquet(idxDir), k = 32, bands = 4, shingleW = 3,
          portable = false, pruneParts = 8)
        .count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"incr_probe_sec=${times.min}%.3f batch_docs=$nBatch mod=$mod dir=$dir")
    spark.stop()
  }
}
