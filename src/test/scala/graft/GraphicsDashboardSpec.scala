package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.jobs.GraphicsDashboard

/** Golden test over a struct-heavy glean-ping fixture (FIXTURES.md A6). */
class GraphicsDashboardSpec extends SparkTestBase {

  private def pingSchema = StructType(Seq(
    StructField("client_info", StructType(Seq(
      StructField("client_id", StringType),
      StructField("app_display_version", StringType)))),
    StructField("submission_timestamp", TimestampType),
    StructField("document_id", StringType),
    StructField("sample_id", IntegerType),
    StructField("metrics", StructType(Seq(
      StructField("string", StructType(Seq(
        StructField("gfx_adapter_primary_vendor_id", StringType)))),
      StructField("labeled_counter", StructType(Seq(
        StructField("canvas_webgl_success", ArrayType(StructType(Seq(
          StructField("key", StringType), StructField("value", LongType)))))))))))))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ping(client: String, version: String, t: String, doc: String,
      sample: Int, vendor: String, ok: Long, fail: Long) =
    Row(Row(client, version), ts(t), doc, sample,
      Row(Row(vendor), Row(Seq(Row("true", ok), Row("false", fail)))))

  private def pings = spark.createDataFrame(java.util.List.of(
    // c1: two pings — only the LATEST (nvidia, 124.0) must count
    ping("c1", "123.0.1", "2024-01-01 00:00:00", "d1", 0, "amd", 1L, 0L),
    ping("c1", "124.0", "2024-01-02 00:00:00", "d2", 0, "nvidia", 5L, 1L),
    // c2: kept, weird version → 'unknown' major
    ping("c2", "beta", "2024-01-01 00:00:00", "d3", 0, "nvidia", 2L, 2L),
    // c3: filtered out by sample bucket
    ping("c3", "124.0", "2024-01-01 00:00:00", "d4", 7, "amd", 9L, 9L),
    // c4: filtered out by null vendor
    Row(Row("c4", "124.0"), ts("2024-01-01 00:00:00"), "d5", 0,
      Row(Row(null), Row(Seq.empty)))),
    pingSchema)

  test("workingSet: sample filter + nested not-null + latest per client") {
    val ws = GraphicsDashboard.workingSet(pings)
    val got = ws.select("document_id").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("d2", "d3"))
  }

  test("vendorShare: version majors, labeled-counter folds, rollup") {
    val rows = GraphicsDashboard.vendorShare(pings).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(("124", "nvidia")) == ((1L, 5L, 1L)))
    assert(rows(("unknown", "nvidia")) == ((1L, 2L, 2L)))
    assert(rows(("all", "all")) == ((2L, 7L, 3L)))
    // per-major subtotal from the rollup
    assert(rows(("124", "all")) == ((1L, 5L, 1L)))
  }
}
