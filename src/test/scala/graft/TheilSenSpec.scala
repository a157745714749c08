package graft

import graft.operators.TheilSen
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Theil–Sen invariants (q315's operator): exact recovery on a clean
  * line, robustness to ~30% outliers where OLS bends, deterministic
  * median selection. */
class TheilSenSpec extends SparkTestBase {

  private def obs(rows: Seq[(String, Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (s, x, cents) =>
        Row(s, x, new java.math.BigDecimal(cents).movePointLeft(2))
      }, 2),
      StructType(Seq(StructField("segment", StringType),
        StructField("x", LongType),
        StructField("y", DecimalType(18, 2)))))

  test("clean line: slope and intercept recovered exactly") {
    // y = 3x + 7 over x = 0..20
    val rows = (0L to 20L).map(x => ("s", x, (3 * x + 7) * 100))
    val r = TheilSen.fit(obs(rows)).collect().head
    assert(r.getDouble(3) == 3.0, s"slope ${r.getDouble(3)}")
    assert(r.getDouble(4) == 7.0, s"intercept ${r.getDouble(4)}")
    assert(r.getDouble(5) == 3.0 * 21 + 7) // f1
  }

  test("30% wild outliers: Theil-Sen holds the true slope, OLS does not") {
    // 21 points on y = 2x + 5; 6 of them blasted +10000
    val rows = (0L to 20L).map { x =>
      val clean = (2 * x + 5) * 100
      val y = if (x % 4 == 3) clean + 1000000 else clean
      ("s", x, y)
    }
    val r = TheilSen.fit(obs(rows)).collect().head
    assert(r.getDouble(3) == 2.0, s"robust slope bent: ${r.getDouble(3)}")
    // OLS on the same data for contrast
    val n = 21.0
    val xs = (0 to 20).map(_.toDouble)
    val ys = rows.map(_._3 / 100.0)
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ols - 2.0) > 10, s"fixture too tame: OLS $ols")
  }

  test("segments fit independently; pair counts are C(n,2)") {
    val rows = (0L to 9L).map(x => ("a", x, x * 100)) ++
      (0L to 4L).map(x => ("b", x, (10 - x) * 100))
    val got = TheilSen.fit(obs(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got("a") == ((10L, 45L, 1.0)))
    assert(got("b") == ((5L, 10L, -1.0)))
  }
}
