package graft

import org.apache.spark.sql.functions._
import graft.llm.TextDedup

/** Leakage-free split (q279's operator shape): splitting on the
  * near-dup cluster id must put every cluster wholly inside one split,
  * while the doc-level hash split demonstrably leaks duplicate pairs
  * across the train/eval boundary on the same corpus. */
class ClusterSplitSpec extends SparkTestBase {

  private def splitOf(c: org.apache.spark.sql.Column) = {
    val b = graft.functions.BqShims.md5Bucket(c) % 10
    when(b < 8, lit("train")).when(b === 8, lit("val")).otherwise(lit("test"))
  }

  test("cluster-key split never straddles; doc-key split does") {
    val d = graft.util.Tables.t(spark, sfDir, "documents")
      .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
    val assigned = TextDedup.clusterAssignments(d, threshold = 0.95,
      k = 32, bands = 8, shingleW = 1)
      .select("doc_id", "cluster_id")
      .withColumn("split", splitOf(col("cluster_id")))
      .withColumn("naive_split", splitOf(col("doc_id")))
    val per = assigned.groupBy("cluster_id")
      .agg(countDistinct("split").as("cs"),
        countDistinct("naive_split").as("ns"))
    assert(per.filter(col("cs") > 1).count() === 0L)
    // the counterfactual: on this corpus the doc-hash split DOES put
    // members of at least one duplicate cluster in different splits —
    // the leakage the operator exists to prevent (2 clusters at
    // sf0.001; if a fixture regeneration ever makes this 0 the corpus
    // no longer exercises the operator and the fixture should change)
    assert(per.filter(col("ns") > 1).count() > 0L)
    // every split is non-degenerate on the fixture
    val splits = assigned.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits === Set("train", "val", "test"))
  }
}
