package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted Bloom-filter sidecar for semi-join pruning — the
  * q117/q140/q142 persisted-index principle applied to membership: a
  * huge build side (e.g. "users who ever purchased") is distilled ONCE
  * into a tiny bit-position table, and any later scan prunes against
  * the broadcast positions instead of joining the build side. Spark's
  * own runtime bloom join (PlanAuditSpec) does this within one query;
  * this is the CROSS-JOB form — the filter outlives the query, like a
  * real ingestion pipeline's "seen before" pre-filter.
  *
  * Portability: the filter is m bits with k md5-derived positions per
  * key (h_j = md5_32(key·"#"·j) mod m), stored SPARSELY as the sorted
  * set of lit bit positions — so both engines replay build AND probe
  * bit-for-bit, false positives included; the oracle needs no
  * probabilistic gate. Membership = every probe position lit
  * (collision-safe via min-over-flags, not a count comparison).
  *
  * Scale shape: build is one explode + distinct (≤ m rows out,
  * whatever the build cardinality); probing broadcasts ≤ m positions
  * and is a per-row filter. FPP follows the standard
  * (1 − e^{−kn/m})^k.
  */
object BloomPrune {

  /** The k bit positions of a key. */
  def positions(key: Column, k: Int, m: Int): Column =
    array((0 until k).map { j =>
      pmod(graft.functions.BqShims.md5Bucket(
        concat(key.cast("string"), lit("#" + j))), lit(m.toLong))
    }: _*)

  /** Build the sparse filter: one row per lit bit (`pos` long). */
  def build(keys: DataFrame, keyCol: String, k: Int, m: Int): DataFrame =
    keys.select(explode(positions(col(keyCol), k, m)).as("pos")).distinct()

  /** Keep probe rows whose EVERY position is lit. `filter` is the
    * (tiny) build output — broadcast onto the probe side. */
  def candidates(probe: DataFrame, keyCol: String, filter: DataFrame,
      k: Int, m: Int): DataFrame = {
    val exploded = probe
      .withColumn("_pos", explode(positions(col(keyCol), k, m)))
    val hit = exploded.join(broadcast(filter.withColumn("_hit", lit(1))),
      exploded("_pos") === filter("pos"), "left")
    hit.groupBy(probe.columns.map(col): _*)
      .agg(min(coalesce(col("_hit"), lit(0))).as("_all"))
      .filter(col("_all") === 1)
      .drop("_all")
  }
}
