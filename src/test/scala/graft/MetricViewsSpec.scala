package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jobs.MetricViews

class MetricViewsSpec extends SparkTestBase {

  private def scoredFixture = {
    val schema = StructType(Seq(
      StructField("number", LongType),
      StructField("creation_time", TimestampType),
      StructField("resolved_time", TimestampType),
      StructField("metric_type_needs_diagnosis", BooleanType),
      StructField("metric_type_firefox_not_supported", BooleanType),
      StructField("triage_score", DecimalType(38, 9)),
      StructField("is_sightline", BooleanType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def d(i: Int) = new java.math.BigDecimal(i)
    spark.createDataFrame(java.util.List.of(
      // open 2024-01-02 → 2024-01-20: covers Sundays Jan 7 + 14
      Row(1L, ts("2024-01-02 10:00:00"), ts("2024-01-20 10:00:00"), true, false, d(10), true),
      // unresolved since 2024-01-10: covers every week from Jan 14 on
      Row(2L, ts("2024-01-10 00:00:00"), null, false, true, d(5), true),
      // excluded by metric condition
      Row(3L, ts("2024-01-01 00:00:00"), null, false, false, d(100), false)),
      schema)
  }

  test("toplineMetric: weekly interval counts + conditional score sums") {
    val out = MetricViews.toplineMetric(scoredFixture,
      MetricViews.MetricDef("sightline", col("is_sightline")),
      java.sql.Date.valueOf("2024-01-07"), java.sql.Date.valueOf("2024-01-28"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDecimal(2).intValueExact(), r.getDecimal(4).intValueExact()))
      .toSeq
    // weeks (Sundays): 01-07, 01-14, 01-21, 01-28
    assert(out == Seq(
      ("2024-01-07", 1L, 10, 10),   // bug1 only
      ("2024-01-14", 2L, 10, 15),   // bug1 + bug2
      ("2024-01-21", 1L, 0, 5),     // bug2 (bug1 resolved Jan 20)
      ("2024-01-28", 1L, 0, 5)))    // bug2 unresolved → clamped to spine end
  }

  test("historyRows: snapshot keyed by recorded_date") {
    val topline = MetricViews.toplineMetric(scoredFixture,
      MetricViews.MetricDef("sightline", col("is_sightline")),
      java.sql.Date.valueOf("2024-01-07"), java.sql.Date.valueOf("2024-01-14"))
    val hist = MetricViews.historyRows(topline, java.sql.Date.valueOf("2024-02-01"))
    assert(hist.columns.head == "recorded_date")
    assert(hist.select("recorded_date").distinct().collect().head.getDate(0)
      == java.sql.Date.valueOf("2024-02-01"))
  }
}
