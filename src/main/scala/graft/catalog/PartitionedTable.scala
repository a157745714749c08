package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet table with delete-by-partition idempotency — the
  * reference's yyyymm range-partitioned tables with delete-then-insert
  * re-import (/root/reference/jobs/webcompat-kb/webcompat_kb/etl/
  * siterank.py:114-135; RangePartition at bqhelpers.py:246-301).
  *
  * Scale: `overwritePartitions` uses dynamic partition overwrite — only
  * the partitions present in the incoming frame are rewritten, the rest
  * of the table is untouched (no full rewrite, no read-modify-write).
  * This is the idiomatic Spark replacement for partition-scoped DELETE
  * + INSERT.
  */
final case class PartitionedTable(spark: SparkSession, path: String,
    partitionCol: String) {

  def read: DataFrame = spark.read.parquet(path)

  /** Idempotent per-partition re-import (delete-then-insert semantics):
    * partitions present in `rows` are replaced atomically per-partition;
    * others untouched. */
  def overwritePartitions(rows: DataFrame): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rows.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Append rows into their partitions. */
  def append(rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)

  /** Partition values currently present (from directory layout — no data
    * scan; mirrors INFORMATION_SCHEMA partition listing). */
  def partitions: Seq[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partitionCol="))
      .map(_.getName.stripPrefix(s"$partitionCol="))
      .sorted.toSeq
  }
}
