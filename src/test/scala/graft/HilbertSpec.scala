package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hilbert, ZOrder}

class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent scalar reference: the classic per-level rotate/reflect
    * xy→d walk on the 16-bit grid. */
  private def xy2d(x0: Long, y0: Long): Long = {
    var cx = x0; var cy = y0; var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((cx & s) > 0) 1L else 0L
      val ry = if ((cy & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { cx = 65535L - cx; cy = 65535L - cy }
        val t = cx; cx = cy; cy = t
      }
      s >>= 1
    }
    d
  }

  test("withH matches the scalar reference walk") {
    val pts = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 0L), (0L, 1L), (12345L, 54321L), (40000L, 7L), (32768L, 32767L))
    val got = Hilbert.withH(pts.toDF("gx", "gy"))
      .select("gx", "gy", "h").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == xy2d(x, y), s"($x,$y)")
    }
    // curve endpoints: (0,0) is position 0; the full space is covered
    assert(got((0L, 0L)) == 0L)
    assert(pts.map(got).distinct.size == pts.size) // injective on sample
  }

  test("first 2-bit quadrant order is the canonical U shape") {
    // On the top level the curve visits quadrants in order
    // (0,0) -> (0,1) -> (1,1) -> (1,0) (x = horizontal axis bit)
    val q = Seq((0L, 0L), (0L, 40000L), (40000L, 40000L), (40000L, 0L))
    val hs = Hilbert.withH(q.toDF("gx", "gy"))
      .select("gx", "gy", "h").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(hs((0L, 0L)) < hs((0L, 40000L)))
    assert(hs((0L, 40000L)) < hs((40000L, 40000L)))
    assert(hs((40000L, 40000L)) < hs((40000L, 0L)))
  }

  test("buckets bound both dimensions and beat z-order's total box size") {
    val o = graft.util.Tables.t(spark, sfDir, "orders")
      .select(col("o_custkey").as("x"),
        datediff(to_date(col("o_orderdate")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("y"))
    def perim(rep: Array[org.apache.spark.sql.Row]): Long = rep.map { r =>
      (r.getAs[Long]("max_x") - r.getAs[Long]("min_x")) +
        (r.getAs[Long]("max_y") - r.getAs[Long]("min_y"))
    }.sum
    val hil = Hilbert.layoutReport(o).collect()
    val zor = ZOrder.layoutReport(o).collect()
    assert(hil.length > 500, s"expected ~1024 buckets, got ${hil.length}")
    // locality: the summed per-bucket box semi-perimeter is the direct
    // measure of how much a range query over-reads; Hilbert's unit-step
    // traversal must not be looser than Morton on the same keys
    assert(perim(hil) <= perim(zor),
      s"hilbert=${perim(hil)} zorder=${perim(zor)}")
  }
}
