package graft

import org.apache.spark.sql.functions._
import graft.operators.TriangleCount

class TriangleCountSpec extends SparkTestBase {
  import spark.implicits._

  test("counts a known graph: K4 has 4 triangles, C(4,2)=6 edges") {
    val k4 = (for (i <- 1 to 4; j <- 1 to 4 if i < j) yield (i.toLong, j.toLong))
      .toDF("src", "dst")
    val r = TriangleCount.count(k4).collect().head
    assert(r.getAs[Long]("n_nodes") === 4)
    assert(r.getAs[Long]("n_edges") === 6)
    assert(r.getAs[Long]("n_triangles") === 4)
    // K4: every wedge closes → cc = 1.0 (W = 4*C(3,2) = 12, 3T/W = 1)
    assert(r.getAs[Long]("n_wedges") === 12)
    assert(r.getAs[Double]("global_cc") === 1.0)
  }

  test("triangle-free graph counts zero (star + path)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r = TriangleCount.count(star).collect().head
    assert(r.getAs[Long]("n_triangles") === 0)
  }

  test("dirty input: self-loops, duplicates, reversed copies are cleaned") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val dirty = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 1L), (2L, 2L), (1L, 2L)).toDF("src", "dst")
    val a = TriangleCount.count(clean).select("n_edges", "n_triangles")
      .as[(Long, Long)].head()
    val b = TriangleCount.count(dirty).select("n_edges", "n_triangles")
      .as[(Long, Long)].head()
    assert(a === (3L, 1L))
    assert(b === a)
  }

  test("matches the naive three-way join on a real subgraph") {
    val ol = graft.util.Tables.t(spark, sfDir, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(7)) === 0)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = ol.select(col("ok"), col("sk").as("src"))
      .join(ol.select(col("ok"), col("sk").as("dst")), "ok")
      .filter(col("src") < col("dst")).select("src", "dst")
    val got = TriangleCount.count(edges)
      .select("n_triangles").as[Long].head()
    val e = edges.distinct()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.src") === col("e1.dst"))
      .join(e.as("e3"), col("e3.src") === col("e1.src") &&
        col("e3.dst") === col("e2.dst"))
      .count()
    assert(got === naive)
    assert(got > 0, "fixture subgraph should contain triangles")
  }
}
