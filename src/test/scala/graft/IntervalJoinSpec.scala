package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def intervals = Seq(
    (1L, 10L, 20L),   // [10,20)
    (2L, 15L, 35L),   // [15,35) — overlaps i1, spans 3 bins at W=10
    (3L, 40L, 41L),   // [40,41) — sub-bin sliver
    (4L, 50L, 60L))   // empty
    .toDF("iid", "lo", "hi")
  private def points = Seq(
    (100L, 10L), (101L, 19L), (102L, 20L), (103L, 34L), (104L, 40L),
    (105L, 9L))
    .toDF("pid", "pts")

  test("binned matches the naive θ-join, each pair exactly once") {
    val got = IntervalJoin.binned(intervals, points, "lo", "hi", "pts",
        binWidth = 10L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = intervals.crossJoin(points)
      .filter(col("pts") >= col("lo") && col("pts") < col("hi"))
      .select("iid", "pid").as[(Long, Long)].collect()
    assert(naive.length === naive.toSet.size)
    assert(got === naive.toSet)
    // multi-bin interval i2 must not duplicate its matches
    val i2 = IntervalJoin.binned(intervals, points, "lo", "hi", "pts", 10L)
      .filter(col("iid") === 2L).select("pid").as[Long].collect()
    assert(i2.sorted.toSeq === i2.distinct.sorted.toSeq)
  }

  test("bin width not dividing interval lengths still exact") {
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = IntervalJoin.binned(intervals, points, "lo", "hi", "pts", w)
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      val naive = intervals.crossJoin(points)
        .filter(col("pts") >= col("lo") && col("pts") < col("hi"))
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      assert(got === naive, s"binWidth=$w")
    }
  }

  test("countPerInterval keeps empty intervals with zero counts") {
    val out = IntervalJoin.countPerInterval(intervals, points,
        "lo", "hi", "pts", 10L, Seq("iid"))
      .orderBy("iid")
      .select("iid", "n_points").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 0L)))
  }

  test("plan is an equi-join on the bin — no nested loop, no cartesian") {
    val plan = IntervalJoin.binned(intervals, points, "lo", "hi", "pts", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must bin to an equi-join:\n$plan")
  }
}
