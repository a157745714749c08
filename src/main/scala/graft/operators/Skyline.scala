package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the multi-objective "best
  * tradeoffs" operator from the DB literature (Börzsönyi et al., ICDE
  * 2001): keep the points no other point dominates (≤ on both axes,
  * < on at least one; both axes minimized here — negate a column to
  * maximize it).
  *
  * The naive formulation is a NOT EXISTS self-θ-join — O(n²), exactly
  * what the oracle runs. The distributed rewrite exploits the 2-D
  * structure: after reducing to the per-x minimum y, a point is on
  * the frontier iff its y beats the running minimum over all strictly
  * smaller x — ONE window pass. The optional grid pre-prune keeps
  * that pass small at scale: bucket minima (a broadcast-sized table)
  * eliminate every point dominated by ANY point in a strictly earlier
  * bucket, so the exact pass only sees frontier candidates — the
  * classic coarse-grid skyline pruning.
  *
  * Scale shape: one groupBy per distinct x (or bucket), one broadcast
  * of #buckets rows, and a final window over the pruned candidate set
  * (≈ frontier-sized). No self-join anywhere.
  */
object Skyline {

  /** Frontier of (minimize xCol, minimize yCol). Returns distinct
    * frontier points as (xCol, yCol). */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      bucketWidth: Option[Double] = None): DataFrame = {
    val pts = df.select(col(xCol).as("_x"), col(yCol).as("_y"))
    val pruned = bucketWidth match {
      case Some(wd) =>
        val withB = pts.withColumn("_b", floor(col("_x") / wd))
        val bmin = withB.groupBy("_b").agg(min(col("_y")).as("_by"))
        val wb = Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)
        val pm = bmin.withColumn("_pm", min(col("_by")).over(wb))
          .select("_b", "_pm")
        withB.join(broadcast(pm), "_b")
          .filter(col("_pm").isNull || col("_y") < col("_pm"))
          .select("_x", "_y")
      case None => pts
    }
    val perX = pruned.groupBy("_x").agg(min(col("_y")).as("_y"))
    val w = Window.orderBy("_x").rowsBetween(Window.unboundedPreceding, -1)
    perX.withColumn("_pm", min(col("_y")).over(w))
      .filter(col("_pm").isNull || col("_y") < col("_pm"))
      .select(col("_x").as(xCol), col("_y").as(yCol))
  }
}
