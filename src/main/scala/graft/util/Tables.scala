package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loading + oracle-parity numeric helpers.
  *
  * Scale note: `t()` returns a plain parquet scan; Catalyst pushes filters
  * and prunes columns into the scan, so every query built on it keeps
  * pushdown. Nothing here collects to the driver.
  *
  * Determinism note: double sums are order-dependent, and at cluster scale
  * the aggregation order is never stable (partial aggs, AQE). The driver
  * hash-compares our parquet output against a DuckDB oracle, so all money
  * sums go through exact decimal accumulation and are cast back to double
  * — bit-identical on both engines regardless of plan shape. This is also
  * the right call at 100 TB: decimal partial aggregation is still a
  * map-side combine; the cost is a wider accumulator, not a new shuffle.
  */
object Tables {
  /** Load a testdata table. `events.parquet` carries TIMESTAMP(NANOS),
    * which Spark 4 only reads with spark.sql.legacy.parquet.nanosAsLong
    * (set in Verify/Bench/test sessions) — convert the nanos long back to
    * a proper timestamp here (micros precision, plenty for this data). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      // integer `div`, not `/`: epoch-nanos (~1.7e18) overflow double
      // precision, so float division is off by up to ±128 µs
      case Some(_) => df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }

  /** Exact order-independent sum of a 2-decimal (currency-like) column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** SUM(price * (1 - disc)) computed entirely in decimal: the source
    * columns are 2-decimal currency values, so casting the *inputs* (not a
    * double product) to decimal is exact, and the whole sum is
    * order-independent and engine-independent. */
  def dsumRevenue(price: Column, disc: Column): Column =
    sum(price.cast(DecimalType(18, 2)) * (lit(1) - disc.cast(DecimalType(4, 2))))
      .cast(DoubleType)

  /** SUM(price * (1 - disc) * (1 + tax)) — same exact-decimal scheme. */
  def dsumCharge(price: Column, disc: Column, tax: Column): Column =
    sum(price.cast(DecimalType(18, 2)) * (lit(1) - disc.cast(DecimalType(4, 2))) *
      (lit(1) + tax.cast(DecimalType(4, 2)))).cast(DoubleType)

  /** Exact mean: decimal sum then a single IEEE double division. */
  def dmean(c: Column): Column =
    sum(c.cast(DecimalType(28, 10))).cast(DoubleType) / count(c)
}
