package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-keyed result cache — the cross-job materialization layer every
  * warehouse ships (BigQuery results cache, Snowflake result reuse):
  * a query's output is persisted once under a key derived from its
  * CANONICALIZED logical plan (alias/order-insensitive, the same
  * normalization Spark's own plan cache uses) plus a caller-supplied
  * input fingerprint (e.g. snapshot version / file mtimes); any later
  * identical query reads the parquet instead of recomputing.
  *
  * The fingerprint keeps staleness explicit: the cache NEVER guesses
  * whether inputs changed — the caller states what version of the
  * world the result belongs to, mirroring how the reference pins
  * table snapshots per run.
  *
  * Scale shape: the cache is a parquet dir per key — reads are
  * ordinary distributed scans; nothing passes through the driver.
  */
object ResultCache {

  /** Stable key for (plan, inputs). */
  def key(df: DataFrame, inputFingerprint: String): String = {
    val planHash = df.queryExecution.analyzed.canonicalized.semanticHash()
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$planHash|$inputFingerprint".getBytes("UTF-8"))
    h.map("%02x".format(_)).mkString
  }

  /** Read-through: return the cached result for (df, fingerprint) or
    * compute df, persist it, and return the re-read. The marker file
    * is written AFTER the parquet commit, so a crashed write is
    * re-attempted, never served. */
  def getOrCompute(spark: SparkSession, df: DataFrame, cacheRoot: String,
      inputFingerprint: String): (DataFrame, Boolean) = {
    val k = key(df, inputFingerprint)
    val dir = java.nio.file.Paths.get(cacheRoot, k)
    val marker = dir.resolve("_GRAFT_COMMITTED")
    if (java.nio.file.Files.exists(marker))
      (spark.read.parquet(dir.toString), true)
    else {
      df.write.mode("overwrite").parquet(dir.toString)
      java.nio.file.Files.write(marker, Array.emptyByteArray)
      (spark.read.parquet(dir.toString), false)
    }
  }
}
