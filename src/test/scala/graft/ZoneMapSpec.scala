package graft

import org.apache.spark.sql.functions._
import graft.operators.ZoneMap

class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  // clustered data: value tracks the zone (id div 10)
  private def clustered = (0 until 200)
    .map(i => (i.toLong, i / 10, i.toLong * 5))
    .toDF("id", "zone", "v")

  test("pruned-path result is identical to the full scan (soundness)") {
    val stats = ZoneMap.build(clustered, "zone", "v")
    val (lo, hi) = (303L, 512L)
    val keep = ZoneMap.overlapping(stats, lit(lo), lit(hi))
    val prunedCount = clustered
      .join(keep.select("zone"), Seq("zone"), "left_semi")
      .filter(col("v").between(lo, hi)).count()
    val fullCount = clustered.filter(col("v").between(lo, hi)).count()
    assert(prunedCount == fullCount)
  }

  test("pruning actually fires on clustered data") {
    val stats = ZoneMap.build(clustered, "zone", "v")
    val total = stats.count()
    val read = ZoneMap.overlapping(stats, lit(303L), lit(512L)).count()
    assert(total == 20)
    // v in [303,512] spans zones 6..10 -> 5 zones read, 15 skipped
    assert(read == 5, s"expected 5 zones read, got $read")
  }

  test("unclustered data degrades to no pruning, never to wrong results") {
    val shuffled = clustered.withColumn("zone", col("id") % 10)
    val stats = ZoneMap.build(shuffled, "zone", "v")
    val keep = ZoneMap.overlapping(stats, lit(303L), lit(512L))
    assert(keep.count() == 10, "every interleaved zone overlaps")
    val prunedCount = shuffled
      .join(keep.select("zone"), Seq("zone"), "left_semi")
      .filter(col("v").between(303, 512)).count()
    assert(prunedCount == shuffled.filter(col("v").between(303, 512)).count())
  }
}
