package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** ANALYZE-style per-column statistics collection — the catalog
  * metadata every cost-based optimizer and file-skipping layer feeds
  * on (null counts, NDV, min/max). The reference leans on BigQuery's
  * implicit table metadata; an engine owning its own parquet layout
  * (q126/q130) needs the explicit collector: these are the same
  * min/max bounds the layout audits publish per bucket, and NDV is
  * what picks broadcast vs shuffle joins at plan time.
  *
  * One distributed pass: every column's aggregates ride a single
  * `agg(...)` (multiple DISTINCT aggregates expand the input — the
  * standard ANALYZE cost, rows × audited columns, still map-side
  * partial and never a driver collect of data). The wide 1-row result
  * is unpivoted driver-side into one row per column (k rows, k =
  * audited columns — metadata, not data).
  *
  * Portability: min/max are published as strings; callers must
  * pre-cast columns whose native string form is engine-ambiguous
  * (double → DECIMAL, timestamp → DATE) — integers, decimals, dates
  * and strings round-trip identically.
  */
object TableStats {

  /** (column_name, n_rows, n_null, n_distinct, min_s, max_s) per
    * audited column. */
  def collect(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        count_distinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast(StringType).as(s"min_$c"),
        max(col(c)).cast(StringType).as(s"max_$c"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*).collect()(0)
    val n = row.getAs[Long]("n_rows")
    cols.map { c =>
      (c, n, n - row.getAs[Long](s"cnt_$c"), row.getAs[Long](s"ndv_$c"),
        row.getAs[String](s"min_$c"), row.getAs[String](s"max_$c"))
    }.toDF("column_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
  }
}
