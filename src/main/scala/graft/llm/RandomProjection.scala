package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Johnson–Lindenstrauss random projection with a DETERMINISTIC
  * ±1 sign matrix — the dimensionality-reduction step before cheap
  * ANN / clustering passes (Achlioptas 2003 shows ±1 entries suffice
  * for the JL guarantee). The matrix entry s(i,j) is derived from the
  * portable md5 hash of (i, j), so there is no RNG state, no seed
  * shipping, and every engine materializes the SAME matrix from the
  * formula — the matrix needs no storage at all.
  *
  * Numeric portability: each projected coordinate is
  * Σ_i v_i·s(i,j) / √d, accumulated as floor(v·2²⁰)·s longs (the
  * Ann/Pooling exact-integer idiom — the former DECIMAL(30,15)
  * accumulator carried a cross-engine double→decimal rounding seam),
  * so the sum is exact, order-independent under any partitioning, and
  * bit-identical on every engine; one IEEE divide by 2²⁰·√d at the
  * end. Long range: the sum is bounded by dim·2²⁰·max|v| — overflow
  * needs dim beyond 2⁴² at unit-scale inputs.
  *
  * Scale shape: explode(vec) × broadcast(sign rows) × sum — one
  * narrow join against a ≤ dim·d row literal matrix, one partial-agg
  * shuffle by (vec, j). Linear in corpus size.
  */
object RandomProjection {

  private val Q20 = 1048576.0 // 2^20, exact in double

  /** Project `embedding` arrays to `d` dims. Returns (idCol, j, p) —
    * one row per output coordinate, j in [0, d). */
  def project(vectors: DataFrame, idCol: String, vecCol: String,
      d: Int): DataFrame = {
    val spark = vectors.sparkSession
    val dim = 64 // testdata embedding width; callers with other widths
                 // pass through fine — extra sign rows never match
    val signs = spark.range(1, dim + 1).select(col("id").as("i"))
      .crossJoin(spark.range(0, d).select(col("id").as("j")))
      .select(col("i"), col("j"),
        (pmod(graft.functions.BqShims.md5Bucket(
          concat(col("i").cast("string"), lit("x"), col("j").cast("string"))),
          lit(2L)) * 2 - 1).as("s"))
    val el = vectors.select(col(idCol), posexplode(col(vecCol)))
      .select(col(idCol), (col("pos") + 1).as("i"), col("col").as("v"))
    el.join(broadcast(signs), "i")
      .groupBy(col(idCol), col("j"))
      .agg(sum(floor(col("v").cast(DoubleType) * lit(Q20)).cast(LongType)
        * col("s")).as("acc"))
      .select(col(idCol), col("j"),
        // round at 6dp (the q63 idiom): the integer accumulation is
        // exact on both engines; rounding pins the published coordinate
        // to a comparator-stable width
        round(col("acc").cast(DoubleType) / lit(Q20 * math.sqrt(d.toDouble)), 6)
          .as("p"))
  }
}
