package graft

import org.apache.spark.sql.functions._
import graft.jobs.Rescore
import graft.operators.HistoricStates.{BugState, BugStates}

class RescoreSpec extends SparkTestBase {
  import spark.implicits._

  private def bd(i: Int) = new java.math.BigDecimal(i)

  private val weights = Map[(String, String), java.math.BigDecimal](
    ("impact", "severe") -> bd(10), ("impact", "low") -> bd(1),
    ("platform", "windows") -> bd(2),
    ("configuration", "general") -> bd(1),
    ("users_affected", "all") -> bd(2),
    ("patch_applied", "none") -> bd(1),
    ("branch", "release") -> bd(1))

  private def mkState(status: String, impact: String) = BugState(
    status, "Web Compatibility", "Site Reports", Seq.empty,
    "https://www.ranked.example/x", s"""{"impact":"$impact","platform":"windows"}""")

  // states newest-first: current RESOLVED (score 0), prior OPEN severe,
  // oldest OPEN low
  private val statesDs = Seq(
    BugStates(1L, Seq(mkState("RESOLVED", "severe"), mkState("NEW", "severe"),
      mkState("NEW", "low")))).toDS()

  private val ranks = Seq((202603L, "www.ranked.example", 500L, 99999L, 99999L))
    .toDF("yyyymm", "host", "global_rank", "core_rank", "local_rank")

  test("historicScores: closed states score 0, open states score F2 × rank") {
    val scores = Rescore.historicScores(spark, statesDs, weights, ranks, 202603L)
      .orderBy("index").collect()
      .map(r => (r.getInt(1), BigDecimal(r.getDecimal(2)))).toSeq
    // open severe: 10 (impact) × 2 (windows) × 1 × 2 (all) × 1 × 1 = 40; ×15 rank = 600
    // open low: 1 × 2 × 1 × 2 × 1 × 1 = 4; ×15 = 60
    assert(scores == Seq((0, BigDecimal(0)), (1, BigDecimal(600)), (2, BigDecimal(60))))
  }

  test("unseenScoreDeltas: consecutive state pairs, anti-joined against recorded") {
    val scores = Rescore.historicScores(spark, statesDs, weights, ranks, 202603L)
    val changeTimes = Seq(
      (1L, 0, "2024-02-01T00:00:00"), // change 0: NEW→RESOLVED (delta 0−600)
      (1L, 1, "2024-01-01T00:00:00")) // change 1: low→severe (delta 600−60)
      .toDF("number", "index", "change_time")
    val recorded = Seq((1L, "2024-01-01T00:00:00")).toDF("number", "change_time")
    val got = Rescore.unseenScoreDeltas(scores, changeTimes, recorded)
      .collect().map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3)))).toSeq
    // the 2024-01-01 delta is already recorded → only the newest emitted
    assert(got == Seq((1L, "2024-02-01T00:00:00", BigDecimal(600), BigDecimal(0))))
  }
}
