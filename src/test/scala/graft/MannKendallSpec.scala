package graft

import graft.operators.MannKendall
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Mann–Kendall gate invariants (q317's operator). */
class MannKendallSpec extends SparkTestBase {

  private def obs(rows: Seq[(String, Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (s, x, cents) =>
        Row(s, x, new java.math.BigDecimal(cents).movePointLeft(2))
      }, 2),
      StructType(Seq(StructField("segment", StringType),
        StructField("x", LongType),
        StructField("y", DecimalType(18, 2)))))

  private def run(rows: Seq[(String, Long, Long)]) =
    MannKendall.test(obs(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toMap

  test("monotone series: S = ±C(n,2), verdicts increasing/decreasing") {
    val up = (0L to 9L).map(x => ("up", x, 100 * x + 1))
    val dn = (0L to 9L).map(x => ("dn", x, 1000 - 10 * x))
    val got = run(up ++ dn)
    assert(got("up") == ((10L, 45L, 10L * 9 * 25, "increasing")))
    assert(got("dn") == ((10L, -45L, 10L * 9 * 25, "decreasing")))
  }

  test("constant series: S = 0, var18 = 0, verdict none (not degenerate)") {
    val got = run((0L to 9L).map(x => ("c", x, 500L)))
    assert(got("c") == ((10L, 0L, 0L, "none")))
  }

  test("trendless alternation fails the gate") {
    val got = run((0L to 9L).map(x => ("alt", x, if (x % 2 == 0) 100L else 200L)))
    assert(got("alt")._4 == "none", s"${got("alt")}")
  }

  test("ties shrink var18 by exactly the tie-correction term") {
    // two tied pairs among 6 points: tsum = 2 * [2*1*9] = 36
    val ys = Seq(100L, 100L, 200L, 200L, 300L, 400L)
    val got = run(ys.zipWithIndex.map { case (y, i) => ("t", i.toLong, y) })
    val (n, _, var18, trend) = got("t")
    assert(n == 6L && var18 == 6L * 5 * 17 - 36, s"${got("t")}")
    assert(trend == "increasing")
  }
}
