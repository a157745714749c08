package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns + typed metadata. The Spark-side
  * contract is real and tested — schema, batch iteration, partition
  * sizing — while the actual codec is STUBBED with a deterministic fake
  * (this container has no image/audio libraries; see builder brief).
  *
  * At scale: decode work is per-row CPU, so the operator's job is to
  * (a) keep batches columnar/iterator-based (mapPartitions — one
  * decoder init per partition, not per row), (b) bound partition bytes
  * (media rows are large — repartition by bytes before decoding), and
  * (c) emit fixed-size features, never the raw payload, downstream.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, feature: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false)))

  /** Build a synthetic media table from documents: utf-8 payload bytes
    * standing in for encoded media. */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      concat(lit("image/fake-"), pmod(col("doc_id"), lit(3))).as("media_type"))

  /** STUB decoder: deterministic fake features from the payload bytes.
    * A real deployment swaps `decodeOne` for an image/audio codec; the
    * mapPartitions shape (decoder init once per partition, iterator in /
    * iterator out, no materialization of the whole partition) is the
    * production pattern. */
  def decodeFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition "codec init" happens here (stubbed)
      rows.map { r =>
        val bytes = r.payload
        val len = bytes.length
        // deterministic fake decode: dimensions + feature vector from bytes
        val width = 16 + (math.abs(len * 31) % 1024)
        val height = 16 + (math.abs(len * 17) % 1024)
        val feature = Array.tabulate(dim) { i =>
          var acc = 0L
          var j = i
          while (j < len) { acc = (acc * 31 + (bytes(j) & 0xff)) % 1000003L; j += dim }
          (acc.toFloat / 1000003.0f) - 0.5f
        }
        MediaFeatures(r.doc_id, r.media_type, len, width, height, feature)
      }
    }
  }
}
