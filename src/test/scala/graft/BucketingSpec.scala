package graft

import org.apache.spark.sql.functions._

/** Bucketing demonstration (SURVEY "Partitioning & shuffle": bucketing
  * for co-located joins): both sides bucketed+sorted on the join key →
  * the join plans with NO shuffle exchange on either side. This is the
  * 100 TB answer for repeated large-large joins on a stable key. */
class BucketingSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_cust")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    val c = graft.util.Tables.t(spark, sfDir, "customer")
    val o = graft.util.Tables.t(spark, sfDir, "orders")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .format("parquet").saveAsTable("b_cust")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("b_orders")
    val joined = spark.table("b_cust")
      .join(spark.table("b_orders"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    // disable broadcast so the join strategy itself is exercised
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_cust")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
