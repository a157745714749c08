package graft.operators

import java.time.LocalDate

/** DAP-collector batch-interval logic (reference:
  * /root/reference/jobs/ads-incrementality-dap-collector/
  * ads_incrementality_dap_collector/models.py:73-113): experiments
  * collect aggregate batches of `batchDurationSeconds` starting at the
  * experiment start date; given a processing date, find the latest
  * batch whose window is fully complete ("collectible"), and collect
  * only on the exact day a batch closes. Ported faithfully, including
  * the first-batch and batch-end edge cases the reference's test suite
  * pins down (tests/test_batch_interval_logic.py).
  */
final case class BatchIntervals(startDate: Option[LocalDate], batchDurationSeconds: Long) {

  private def durationDays: Long = batchDurationSeconds / 86400L

  /** Start of the latest collectible batch (models.py:73-101). */
  def latestCollectibleBatchStart(processDate: LocalDate): LocalDate = {
    val start = startDate.getOrElse(
      sys.error("Experiment is not launched, no latest collectible batch start"))
    // start on/after process date, or process date inside the first batch
    // (excluding its end day) → the first batch is the latest
    if (!start.isBefore(processDate) ||
        start.plusDays(durationDays - 1).isAfter(processDate))
      return start
    var batchIntervalStart = start
    while (!batchIntervalStart.isAfter(processDate))
      batchIntervalStart = batchIntervalStart.plusDays(durationDays)
    if (processDate == batchIntervalStart.minusDays(1))
      batchIntervalStart.minusDays(durationDays)
    else
      batchIntervalStart.minusDays(2 * durationDays)
  }

  /** Inclusive end day of the latest collectible batch (models.py:103-108). */
  def latestCollectibleBatchEnd(processDate: LocalDate): LocalDate =
    latestCollectibleBatchStart(processDate).plusDays(durationDays - 1)

  /** Collect only on the day a batch closes (models.py:110-113). */
  def shouldCollectBatch(processDate: LocalDate): Boolean =
    startDate.nonEmpty && latestCollectibleBatchEnd(processDate) == processDate
}
