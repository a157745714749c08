package graft

import org.apache.spark.sql.functions._
import graft.operators.DataChecks
import graft.operators.DataChecks._

class DataChecksSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, None, 5.0),
    (3L, Some("c"), -1.0),
    (3L, Some("d"), 2.0)
  ).toDF("id", "name", "v")

  test("audit evaluates every declared check in one pass") {
    val out = DataChecks.audit(df, Seq(
      nonEmpty,
      complete("name"),
      unique("id"),
      satisfies("v_nonneg", col("v") >= 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out("non_empty") == ((4L, true)))
    assert(out("name_complete") == ((1L, false)))
    assert(out("id_unique") == ((1L, false)))
    assert(out("v_nonneg") == ((1L, false)))
  }

  test("audit is a single scan: one Aggregate over the input") {
    val plan = DataChecks.audit(df, Seq(nonEmpty, complete("name"),
      satisfies("v_nonneg", col("v") >= 0)))
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one aggregate, got:\n$plan")
  }

  test("orphans counts referential violations, zero when parent covers") {
    val parent = Seq(1L, 2L).toDF("pid")
    val r = DataChecks.orphans(df, "id", parent, "pid", "ri").head
    assert(r.getString(0) == "ri" && r.getLong(1) == 2L && !r.getBoolean(2))
    val full = Seq(1L, 2L, 3L).toDF("pid")
    val r2 = DataChecks.orphans(df, "id", full, "pid", "ri").head
    assert(r2.getLong(1) == 0L && r2.getBoolean(2))
  }

  test("checks on an empty table: non_empty fails, the rest hold") {
    val empty = df.filter(col("id") < 0)
    val out = DataChecks.audit(empty, Seq(nonEmpty, complete("name")))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!out("non_empty") && out("name_complete"))
  }
}
