package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality audit: a declared set of table constraints
  * (completeness, uniqueness, value bounds, referential integrity)
  * evaluated in ONE aggregation pass and published as one row per
  * check — (check, metric, ok). The metric is always an exact integer
  * (violation/row count), so the audit is engine-replayable and a
  * regression flips a boolean, the q133/q164 contract pattern.
  *
  * Scale shape: all metrics fold into a single `df.agg(...)` (count
  * distincts included — Catalyst plans them in one expand+aggregate),
  * so the table is scanned once regardless of how many checks are
  * declared; referential checks are separate anti-join counts, each
  * one broadcast-or-shuffle join with AQE choosing.
  */
object DataChecks {

  /** One declared check: `metric` is an aggregate Column evaluating to
    * BIGINT; `ok` maps the metric value to the pass/fail verdict. */
  final case class Check(name: String, metric: Column, ok: Column => Column)

  /** Row count must be positive. */
  def nonEmpty: Check =
    Check("non_empty", count(lit(1)), _ > 0)

  /** No NULLs in `c`. */
  def complete(c: String): Check =
    Check(s"${c}_complete", count(lit(1)) - count(col(c)), _ === 0)

  /** `c` is unique (no duplicate values among non-nulls). */
  def unique(c: String): Check =
    Check(s"${c}_unique", count(col(c)) - count_distinct(col(c)), _ === 0)

  /** All non-null values of `c` satisfy `pred`. */
  def satisfies(name: String, pred: Column): Check =
    Check(name, sum(when(pred, 0).otherwise(1)).cast("long"), _ === 0)

  /** Evaluate all checks in one pass: (check, metric, ok) rows. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(c.metric.cast("long"), lit(0L)).as(s"m$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(s"m$i").as("metric"),
        c.ok(col(s"m$i")).as("ok"))
    }
    row.select(explode(array(stacked: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity violation count: rows of `child` whose
    * `childKey` has no match in `parent.parentKey`. */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("metric"))
      .select(lit(name).as("check"), col("metric"),
        (col("metric") === 0).as("ok"))
}
