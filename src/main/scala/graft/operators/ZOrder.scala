package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Z-order (Morton) multi-dimensional clustering — the lakehouse data
  * layout that makes min/max file skipping work on TWO predicates at
  * once. A 1-D sort bounds one column per file and leaves the other
  * unbounded; interleaving the bits of both keys gives every z-range
  * a bounded box in BOTH dimensions, so a (customer × date-range) box
  * query prunes to ~the box's area instead of a full stripe. At 100 TB
  * the write is `df.repartitionByRange(col("z")).sortWithinPartitions
  * ("z")` → parquet, and the scan-side prune is plain parquet row-group
  * min/max stats — no custom reader needed; this object contributes
  * the portable z computation and the per-bucket bound audit.
  *
  * Everything is integer bit arithmetic except the 16-bit grid scaling,
  * which is one correctly-rounded double multiply/divide + floor —
  * identical in any IEEE engine, so the oracle replays the layout
  * bit-for-bit.
  */
object ZOrder {

  /** Interleave two 16-bit grid coordinates (x → even bits, y → odd
    * bits) into a 32-bit Morton code. Disjoint bit positions, so the
    * 32-term sum IS the bitwise-or, and everything stays codegen'd
    * integer ops. */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Scale v ∈ [vmin, vmax] onto the 16-bit grid:
    * floor((v−min)·65535 / max(max−min, 1)). Runs in doubles (exact
    * parity across IEEE engines; inputs ≪ 2^53). Monotone in v, so
    * range predicates on v map to range predicates on the grid. */
  def grid16(v: Column, vmin: Column, vmax: Column): Column =
    floor(((v - vmin).cast(DoubleType) * 65535.0d) /
      greatest((vmax - vmin).cast(DoubleType), lit(1.0d))).cast(LongType)

  /** The DuckDB-side expression of [[interleave16]] over pre-computed
    * grid columns — generated from the same bit positions so the two
    * sides cannot drift. */
  def interleaveSql(gx: String, gy: String): String =
    (0 until 16).map { i =>
      s"((($gx >> $i) & 1) * ${1L << (2 * i)}) + " +
        s"((($gy >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** z-value for a frame with integer columns x and y (min/max taken
    * from the data via a broadcast 1-row agg, so the layout is
    * scale-stable: the grid tracks the actual key ranges). */
  def withZ(df: DataFrame, xCol: String = "x", yCol: String = "y"): DataFrame = {
    val mm = df.agg(
      min(col(xCol)).as("xmin"), max(col(xCol)).as("xmax"),
      min(col(yCol)).as("ymin"), max(col(yCol)).as("ymax"))
    df.crossJoin(broadcast(mm))
      .withColumn("z", interleave16(
        grid16(col(xCol), col("xmin"), col("xmax")),
        grid16(col(yCol), col("ymin"), col("ymax"))))
  }

  /** Per-z-bucket bound audit (bucket = top `bucketBits` of the 32-bit
    * z): row count and min/max of BOTH dimensions. The bounded boxes
    * are exactly the min/max stats a parquet file laid out by z-range
    * would carry — the skippability evidence, engine-checkable. */
  def layoutReport(df: DataFrame, xCol: String = "x", yCol: String = "y",
      bucketBits: Int = 10): DataFrame =
    withZ(df, xCol, yCol)
      .withColumn("bucket", shiftright(col("z"), 32 - bucketBits))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
}
