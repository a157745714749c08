package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{SessionEvent, SessionOut}

class StreamOpsSpec extends SparkTestBase {

  test("sessionize: gap-based sessions per user via flatMapGroupsWithState") {
    import spark.implicits._
    val m = 1000000L // 1s in micros
    val events = Seq(
      SessionEvent(1L, 0 * m, "a"), SessionEvent(1L, 5 * m, "b"),
      SessionEvent(1L, 100 * m, "c"), SessionEvent(1L, 103 * m, "d"),
      SessionEvent(1L, 300 * m, "e"), // still open at end → not emitted
      SessionEvent(2L, 0 * m, "x"), SessionEvent(2L, 500 * m, "y")).toDS()
    val sessions = StreamOps.sessionize(spark, events, gapMicros = 30 * m)
      .collect().sortBy(s => (s.user_id, s.session_start)).toSeq
    assert(sessions == Seq(
      SessionOut(1L, 0 * m, 5 * m, 2),
      SessionOut(1L, 100 * m, 103 * m, 2),
      SessionOut(2L, 0 * m, 0 * m, 1)))
  }

  test("sessionizeBatch (window-function scale path) matches the state-based form") {
    import spark.implicits._
    val m = 1000000L
    // deliberately unsorted input: the window form must not depend on
    // arrival order (the state-based form sorts per group)
    val events = Seq(
      SessionEvent(1L, 103 * m, "d"), SessionEvent(1L, 0 * m, "a"),
      SessionEvent(1L, 300 * m, "e"), SessionEvent(1L, 5 * m, "b"),
      SessionEvent(1L, 100 * m, "c"),
      SessionEvent(2L, 500 * m, "y"), SessionEvent(2L, 0 * m, "x")).toDS()
    val batch = StreamOps.sessionizeBatch(spark, events, gapMicros = 30 * m)
      .collect().sortBy(s => (s.user_id, s.session_start)).toSeq
    val stateBased = StreamOps.sessionize(spark, events, gapMicros = 30 * m)
      .collect().sortBy(s => (s.user_id, s.session_start)).toSeq
    assert(batch == stateBased)
    assert(batch == Seq(
      SessionOut(1L, 0 * m, 5 * m, 2),
      SessionOut(1L, 100 * m, 103 * m, 2),
      SessionOut(2L, 0 * m, 0 * m, 1)))
  }
}
