package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement via PRIORITY SAMPLING
  * (Duffield–Lund–Thorup, JACM 2007): each item gets priority
  * q_i = w_i / u_i with u_i uniform in (0,1]; the k highest-priority
  * items form the sample, and with τ = the (k+1)-th priority the
  * estimator ŵ_i = max(w_i, τ) makes Σ_S ŵ an unbiased estimate of the
  * population's total weight — the principled way to downsample a
  * corpus by importance (long docs, high-quality docs) while keeping
  * aggregate statistics estimable.
  *
  * Determinism contract: u_i is the portable md5-derived 32-bit
  * uniform ((md5Bucket(id)+1) / 2^32), and the priority is computed as
  * w·2^32 / u_int — ONE exact integer-product double (w·2^32 < 2^53
  * for any realistic weight) and one correctly-rounded IEEE divide, so
  * DuckDB replays every priority, the threshold, and the estimator
  * bit-for-bit. No RNG state anywhere.
  *
  * Scale shape: the top-(k+1) is `orderBy(desc).limit` — Spark plans
  * TakeOrderedAndProject (per-partition bounded heaps, driver merge of
  * k+1 rows per partition), NOT a global sort shuffle. The only global
  * window runs over the k+1 surviving rows.
  */
object PrioritySample {

  /** The portable priority column. Weight must satisfy w·2^32 < 2^53
    * (w < ~2M) for exact cross-engine products. */
  def priority(id: Column, weight: Column): Column =
    weight.cast("double") * lit(4294967296.0) /
      (graft.functions.BqShims.md5Bucket(id) + lit(1L))

  /** Sample k items by priority; returns (rank, original cols...,
    * priority, w_hat) where w_hat = max(w, τ) is the unbiased
    * total-weight estimator share. */
  def sample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val top = df
      .withColumn("priority", priority(col(idCol), col(weightCol)))
      .orderBy(desc("priority"), col(idCol))
      .limit(k + 1)
    // k+1 rows: the global window is bounded by construction
    val wAll = Window.orderBy(desc("priority"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    top
      .withColumn("_tau", min(col("priority")).over(wAll))
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("priority"), col(idCol))))
      .filter(col("rank") <= k)
      .withColumn("w_hat",
        greatest(col(weightCol).cast("double"), col("_tau")))
      .drop("_tau")
  }
}
