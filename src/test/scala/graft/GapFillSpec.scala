package graft

import org.apache.spark.sql.functions._
import graft.operators.GapFill

class GapFillSpec extends SparkTestBase {
  import spark.implicits._

  test("densify + ffill + lerp on a hand-checked series") {
    // key 1: days 10(v=2), 13(v=8), 14(v=4) -> gaps at 11, 12
    // key 2: single observation -> no gaps
    val obs = Seq((1L, 10L, 2L), (1L, 13L, 8L), (1L, 14L, 4L), (2L, 5L, 7L))
      .toDF("key", "day", "v")
    val out = GapFill.fillDaily(obs)
      .select("key", "day", "is_gap", "ffill", "lerp")
      .orderBy("key", "day")
      .as[(Long, Long, Boolean, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, false, 2L, 2.0),
      (1L, 11L, true, 2L, 2.0 + 6.0 * 1 / 3), // 2 + (8-2)*(11-10)/(13-10)
      (1L, 12L, true, 2L, 2.0 + 6.0 * 2 / 3),
      (1L, 13L, false, 8L, 8.0),
      (1L, 14L, false, 4L, 4.0),
      (2L, 5L, false, 7L, 7.0)))
  }

  test("spine is per-key bounded: no key pays for the global range") {
    val obs = Seq((1L, 0L, 1L), (1L, 2L, 1L), (2L, 1000000L, 1L),
      (2L, 1000001L, 1L)).toDF("key", "day", "v")
    val out = GapFill.fillDaily(obs)
    // global range is ~1e6 days; per-key spines total 3 + 2 rows
    assert(out.count() == 5)
  }

  test("all windows and the spine share one exchange by key") {
    val obs = graft.util.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "error")
      .groupBy(col("user_id").as("key"),
        datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("day"))
      .agg(count(lit(1)).as("v"))
    val filled = GapFill.fillDaily(obs)
    val plan = filled.queryExecution.executedPlan.toString
    // expected exchanges: one for the groupBy rollup (by key,day), one
    // for the spine agg (by key), one to co-locate the spine join —
    // and NO additional exchange for either window fill
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n <= 3, s"expected <=3 shuffles, got $n:\n$plan")
    assert(filled.filter(col("is_gap")).count() > 0)
  }
}
