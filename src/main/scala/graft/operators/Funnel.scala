package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Short-circuiting funnel classification (reference:
  * /root/reference/jobs/update-orphaning-dashboard/
  * update_orphaning_dashboard/processing.py:154-230 `categorize`: each
  * client walks ordered stages, stopping at the first False; every stage
  * tallies True/False over the clients that reached it).
  *
  * Spark-native form: ONE pass, one aggregation — for stage i,
  * reached_i = ∧(pred_1..pred_{i-1}), and the tallies are
  * count_if(reached ∧ pred) / count_if(reached ∧ ¬pred). The reference
  * streams clients through Python one at a time; here the whole funnel
  * is a codegen'd projection + partial-aggregated counts, so it scales
  * with executors instead of a single driver loop.
  */
object Funnel {

  /** Per-stage (stage, n_true, n_false) counts, in stage order.
    * Null predicate results count as non-True (the reference's
    * `if key is not True: continue`). */
  def funnelCounts(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    val aggs = stages.zipWithIndex.flatMap { case ((name, _), i) =>
      val reached = stages.take(i).map(_._2)
        .foldLeft(lit(true))((acc, p) => acc && coalesce(p, lit(false)))
      val pred = coalesce(stages(i)._2, lit(false))
      Seq(count_if(reached && pred).as(s"${name}__true"),
        count_if(reached && !pred).as(s"${name}__false"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = stages.map { case (name, _) =>
      s"'$name', ${name}__true, ${name}__false"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${stages.size}, $stackExpr) AS (stage, n_true, n_false)")
  }
}
