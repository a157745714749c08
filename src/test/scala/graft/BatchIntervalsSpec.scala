package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BatchIntervals

/** Ports the reference's batch-interval test matrix
  * (tests/test_batch_interval_logic.py:11-135): experiment starts
  * 2025-08-18, default batch duration 7 days. */
class BatchIntervalsSpec extends AnyFunSuite {

  private def d(s: String) = LocalDate.parse(s)
  private val exp = BatchIntervals(Some(d("2025-08-18")), 7L * 86400)

  private def check(process: String, shouldCollect: Boolean,
      start: String, end: String): Unit = {
    val p = d(process)
    assert(exp.shouldCollectBatch(p) == shouldCollect, s"should_collect @$process")
    assert(exp.latestCollectibleBatchStart(p) == d(start), s"start @$process")
    assert(exp.latestCollectibleBatchEnd(p) == d(end), s"end @$process")
  }

  test("future experiment start date")(check("2025-08-01", false, "2025-08-18", "2025-08-24"))
  test("process date is the experiment start date")(check("2025-08-18", false, "2025-08-18", "2025-08-24"))
  test("process date in middle of first batch")(check("2025-08-22", false, "2025-08-18", "2025-08-24"))
  test("process date is the end date of first batch")(check("2025-08-24", true, "2025-08-18", "2025-08-24"))
  test("process date is start date of subsequent batch")(check("2025-09-08", false, "2025-09-01", "2025-09-07"))
  test("process date is end date of subsequent batch")(check("2025-09-07", true, "2025-09-01", "2025-09-07"))

  test("non-default 14-day duration") {
    val exp14 = BatchIntervals(Some(d("2025-08-18")), 14L * 86400)
    assert(exp14.latestCollectibleBatchStart(d("2025-08-25")) == d("2025-08-18"))
    assert(exp14.latestCollectibleBatchEnd(d("2025-08-25")) == d("2025-08-31"))
    assert(exp14.shouldCollectBatch(d("2025-08-31")))
    assert(exp14.latestCollectibleBatchStart(d("2025-09-15")) == d("2025-09-01"))
  }

  test("unlaunched experiment: no collectible batch") {
    val un = BatchIntervals(None, 7L * 86400)
    assert(!un.shouldCollectBatch(d("2025-08-24")))
    intercept[RuntimeException](un.latestCollectibleBatchStart(d("2025-08-24")))
  }
}
