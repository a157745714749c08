package graft.operators

/** VDAF histogram parsing + field-prime wraparound correction
  * (reference: jobs/ads-incrementality-dap-collector/
  * ads_incrementality_dap_collector/helpers.py:196-209). Distinct from
  * the u64 wraparound in BqShims (dap-collector variant): here sums
  * live in a ~2^128 prime field, and values above 2^127 are negative
  * contributions wrapped around the FIELD PRIME.
  *
  * Driver/executor-side pure functions (the collector subprocess output
  * is a small per-task string; parsing it is not a distributed concern —
  * the resulting rows are).
  */
object VdafParse {

  /** The VDAF Field128 prime (helpers.py:197). */
  val FieldPrime: BigInt = BigInt("340282366920938462946865773367900766209")
  private val cutoff: BigInt = BigInt(2).pow(127)

  /** helpers.py:196-203: values above 2^127 are wrapped negatives. */
  def correctWraparound(num: BigInt): BigInt =
    if (num > cutoff) num - FieldPrime else num

  /** helpers.py:205-209: a python-list literal of field elements →
    * bucket-indexed histogram with wraparound correction. */
  def parseHistogram(histogramStr: String): Map[Int, BigInt] = {
    val body = histogramStr.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) Map.empty
    else body.split(",").map(_.trim).zipWithIndex.map { case (v, i) =>
      i -> correctWraparound(BigInt(v))
    }.toMap
  }
}
