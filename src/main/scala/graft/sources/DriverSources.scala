package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-side ingest utilities (SURVEY §2.1 S8/S10): sources that are
  * inherently sequential (REST paging, binary archive headers) run on
  * the driver and hand Spark a DataFrame; everything downstream is
  * distributed. Mirrors the reference's ingest split (bugzilla REST
  * paging etl/bugzilla.py:511-568; pg_dump TOC parse
  * pg_dump_to_parquet.py:139-169).
  */
object DriverSources {

  /** S10 — paged-API ingest: pull pages from `fetchPage(pageIndex)`
    * until it returns an empty page (or maxPages), with the reference's
    * retry loop (3 attempts). The fetcher is driver-side; rows land in
    * one DataFrame with an explicit schema. */
  def pagedSource(spark: SparkSession, schema: StructType, maxPages: Int = 1000,
      retries: Int = 3)(fetchPage: Int => Seq[Row]): DataFrame = {
    val rows = Iterator.from(0)
      .take(maxPages)
      .map { page =>
        var attempt = 0
        var result: Option[Seq[Row]] = None
        while (result.isEmpty) {
          try result = Some(fetchPage(page))
          catch {
            case e: Exception =>
              attempt += 1
              if (attempt >= retries) throw e
          }
        }
        result.get
      }
      .takeWhile(_.nonEmpty)
      .flatten
      .toSeq
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** S8 — binary TOC parse: a length-prefixed binary directory of
    * (id: int32 BE, name: utf8 with int16 BE length) entries → DataFrame
    * of (table_id, table_name). The pg_dump `toc.dat` analog: parse on
    * the driver, distribute the result. */
  def parseBinaryToc(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val rows = (0 until n).map { _ =>
      val id = bb.getInt
      val len = bb.getShort.toInt
      val name = new Array[Byte](len)
      bb.get(name)
      Row(id, new String(name, "UTF-8"))
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("table_id", IntegerType, nullable = false),
        StructField("table_name", StringType, nullable = false))))
  }

  /** Encode helper for tests/fixtures (inverse of parseBinaryToc). */
  def encodeToc(entries: Seq[(Int, String)]): Array[Byte] = {
    val payloads = entries.map { case (id, name) => (id, name.getBytes("UTF-8")) }
    val size = 4 + payloads.map(6 + _._2.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    payloads.foreach { case (id, nameBytes) =>
      bb.putInt(id); bb.putShort(nameBytes.length.toShort); bb.put(nameBytes)
    }
    bb.array()
  }
}
