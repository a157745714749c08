package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for hot join keys (SURVEY §4 / builder brief: "salting
  * for skew"). AQE's skew-join split handles most cases at runtime; this
  * is the explicit form for when a handful of keys dominate so badly
  * that even split partitions bottleneck (or AQE is unavailable, e.g.
  * inside a cached stage).
  *
  * Shape: the fact side gets a random-but-deterministic salt in
  * [0, saltFactor) appended to the key; the dimension side is exploded
  * ×saltFactor so every salted key finds its match. Equi-join semantics
  * are preserved exactly; the hot key's rows now spread over saltFactor
  * partitions. Cost: dimension side inflates ×saltFactor — use on
  * broadcast-too-big-but-still-small dimensions.
  */
object SkewSalt {

  /** Deterministic salt from row identity (stable across retries —
    * required for exactly-once semantics under task re-execution). */
  private def salt(cols: Seq[Column], saltFactor: Int): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor))

  /** Inner equi-join of `fact` and `dim` on `key`, salted `saltFactor`
    * ways. `factIdCols` must identify fact rows (drives the stable salt). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factIdCols: Seq[String], saltFactor: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      salt(factIdCols.map(col), saltFactor))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
