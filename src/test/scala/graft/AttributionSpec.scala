package graft

import org.apache.spark.sql.functions._
import graft.operators.Attribution

class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String, Long)], lookback: Long = 100L) =
    Attribution.lastTouch(rows.toDF("key", "ts", "kind", "id"),
        touchKinds = Seq("click", "view"), convKind = "purchase",
        lookback = lookback)
      .select("key", "conv_id", "touch_id", "touch_kind")
      .orderBy("key", "conv_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[String])))
      .toSeq

  test("latest preceding touch wins; other users' touches never bleed") {
    val got = run(Seq(
      (1L, 10L, "click", 100L), (1L, 20L, "view", 101L),
      (1L, 30L, "purchase", 102L), // credit view 101 (latest)
      (2L, 25L, "click", 200L), (2L, 26L, "purchase", 201L),
      (3L, 5L, "purchase", 300L))) // no touch at all
    assert(got == Seq(
      (1L, 102L, Some(101L), Some("view")),
      (2L, 201L, Some(200L), Some("click")),
      (3L, 300L, None, None)))
  }

  test("lookback horizon: stale touches earn no credit") {
    val got = run(Seq(
      (1L, 10L, "click", 100L),
      (1L, 200L, "purchase", 101L)), lookback = 100L)
    assert(got == Seq((1L, 101L, None, None)))
    val close = run(Seq(
      (1L, 100L, "click", 100L),
      (1L, 200L, "purchase", 101L)), lookback = 100L)
    assert(close == Seq((1L, 101L, Some(100L), Some("click")))) // boundary inclusive
  }

  test("conversions between touches each credit their own predecessor") {
    val got = run(Seq(
      (1L, 10L, "click", 100L), (1L, 11L, "purchase", 101L),
      (1L, 12L, "view", 102L), (1L, 13L, "purchase", 103L)))
    assert(got == Seq(
      (1L, 101L, Some(100L), Some("click")),
      (1L, 103L, Some(102L), Some("view"))))
  }

  test("single pass: one exchange, no join anywhere in the plan") {
    val e = graft.util.Tables.t(spark, sfDir, "events")
      .select(col("user_id").as("key"), graft.functions.BqShims.epochMicros(col("ts")).as("ts"),
        col("event_type").as("kind"), col("event_id").as("id"))
    val out = Attribution.lastTouch(e, Seq("click", "view"), "purchase",
      259200000000L)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Join"), plan)
    assert(out.count() > 0)
  }
}
