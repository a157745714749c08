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
    // deliberately unsorted input: neither form may depend on arrival
    // order (the state-based form interval-merges, the window form sorts)
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

  test("sessionize: skewed user, shuffled order — interval merge, not group sort") {
    import spark.implicits._
    val m = 1000000L
    // one user owns 20k events forming 100 sessions of 200 events each
    // (1s spacing inside a session, 10min gaps between); a deterministic
    // shuffle destroys arrival order. The interval-merge fold keeps peak
    // live state at O(sessions), where the old sort-and-materialize held
    // all 20k rows; correctness here certifies the order-insensitive fold.
    val events = (for {
      sess <- 0 until 100
      i <- 0 until 200
    } yield SessionEvent(1L, (sess * 1000L + i) * m, "e"))
      .sortBy(e => (e.ts_micros * 2654435761L) % 1000003) // deterministic shuffle
      .toDS().repartition(4)
    val sessions = StreamOps.sessionize(spark, events, gapMicros = 30 * m)
      .collect().sortBy(_.session_start).toSeq
    // last session stays open → 99 emitted
    assert(sessions.size == 99)
    assert(sessions.forall(_.n_events == 200))
    assert(sessions.head == SessionOut(1L, 0L, 199 * m, 200))
    // events arriving in a LATER trigger merge across the stored state:
    // exercised by the cross-batch path in q107's AvailableNow run
  }

  test("sessionize: cross-interval bridge event merges two sessions") {
    import spark.implicits._
    val m = 1000000L
    // two clusters 50s apart (gap 30s would split), plus a bridge at 25s
    // arriving LAST: interval merge must fuse everything into one session
    val events = Seq(
      SessionEvent(1L, 0 * m, "a"), SessionEvent(1L, 50 * m, "b"),
      SessionEvent(1L, 999 * m, "z"), // later isolated event closes the merged one
      SessionEvent(1L, 25 * m, "bridge")).toDS()
    val sessions = StreamOps.sessionize(spark, events, gapMicros = 30 * m)
      .collect().toSeq
    assert(sessions == Seq(SessionOut(1L, 0 * m, 50 * m, 3)))
  }
}
