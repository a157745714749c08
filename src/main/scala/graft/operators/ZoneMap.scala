package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone-map (min/max statistics) data skipping — the q157 persisted-
  * sidecar principle applied to range predicates: a table clustered by
  * ingestion order is summarized ONCE into per-zone [min,max] bounds on
  * a correlated column (here: event time, which tracks event_id), and
  * any later range scan consults the tiny sidecar to skip whole zones
  * whose bounds cannot intersect the predicate. This is the mechanism
  * behind parquet row-group stats / Iceberg manifests / ClickHouse
  * sparse indexes, surfaced as an explicit operator so the pruning
  * decision is auditable and oracle-replayable.
  *
  * Soundness is by construction: a pruned zone has zmax < lo or
  * zmin > hi, so no row in it can satisfy BETWEEN(lo, hi) — the
  * pruned-path result is identical to the full scan, and the oracle
  * recomputes both the zone bounds and the pruning set exactly.
  *
  * Scale shape: the sidecar is one groupBy over the clustering key
  * (zones ≪ rows, ~one per file/row-group); the probe broadcasts the
  * surviving zone ids into a semi-join that feeds the scan's partition
  * pruning. At 100 TB the sidecar is MBs while the skipped IO is TBs.
  */
object ZoneMap {

  /** Per-zone [min,max,count] stats of `orderCol` — the persisted
    * sidecar. */
  def build(df: DataFrame, zoneCol: String, orderCol: String): DataFrame =
    df.groupBy(col(zoneCol).as("zone"))
      .agg(min(col(orderCol)).as("zmin"), max(col(orderCol)).as("zmax"),
        count(lit(1)).as("zrows"))

  /** Zones whose [zmin, zmax] can intersect [lo, hi] — everything else
    * is provably predicate-free and skipped. */
  def overlapping(stats: DataFrame, lo: Column, hi: Column): DataFrame =
    stats.filter(col("zmax") >= lo && col("zmin") <= hi)
}
