package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline
import graft.util.Tables.t

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("matches the naive NOT EXISTS dominance on a known set") {
    // (1,5) (2,3) (3,3) (4,1) (5,1) minimized both: frontier (1,5),(2,3),(4,1)
    val pts = Seq((1.0, 5L), (2.0, 3L), (3.0, 3L), (4.0, 1L), (5.0, 1L),
      (2.0, 4L), (2.0, 3L)).toDF("x", "y")
    val got = Skyline.skyline2D(pts, "x", "y")
      .as[(Double, Long)].collect().toSet
    assert(got === Set((1.0, 5L), (2.0, 3L), (4.0, 1L)))
  }

  test("grid pre-prune is invariant: same frontier for any bucket width") {
    val o = t(spark, sfDir, "orders").select(col("o_totalprice").as("x"),
      (-datediff(to_date(col("o_orderdate")),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")).as("y"))
    val exact = Skyline.skyline2D(o, "x", "y", None)
      .as[(Double, Long)].collect().toSet
    for (wd <- Seq(100.0, 5000.0, 1e9)) {
      val pruned = Skyline.skyline2D(o, "x", "y", Some(wd))
        .as[(Double, Long)].collect().toSet
      assert(pruned === exact, s"bucketWidth=$wd")
    }
    assert(exact.nonEmpty)
  }

  test("frontier is mutually non-dominated and dominates everything else") {
    val o = t(spark, sfDir, "orders").select(col("o_totalprice").as("x"),
      (-datediff(to_date(col("o_orderdate")),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")).as("y"))
    val f = Skyline.skyline2D(o, "x", "y", Some(1000.0))
      .as[(Double, Long)].collect().sortBy(_._1)
    // sorted by x ascending, y must strictly decrease (2-D frontier shape)
    f.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(x1 < x2 && y1 > y2, s"($x1,$y1) vs ($x2,$y2)")
    case _ => ()
    }
  }

  test("plan has no self-join: one window over the pruned candidates") {
    val o = t(spark, sfDir, "orders").select(col("o_totalprice").as("x"),
      lit(0L).as("y"))
    val plan = Skyline.skyline2D(o, "x", "y", Some(1000.0))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("NOT EXISTS") && !plan.toLowerCase.contains("antijoin"),
      s"no dominance anti-join wanted:\n$plan")
  }
}
