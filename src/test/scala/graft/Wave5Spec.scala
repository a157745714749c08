package graft

import org.apache.spark.sql.functions._

/** Wave-5 operator invariants: hashed linear classifier (q193), KS
  * two-sample gate (q194), ACF gate (q195), largest-remainder token
  * budget (q196), cumulative-distinct rewrite (q197). Value-level
  * parity with DuckDB is the driver gate; these assert the properties
  * the gate can't see. */
class Wave5Spec extends SparkTestBase {
  import spark.implicits._

  test("classifier: weights span the full range and scores are repartition-invariant") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, ""), (4L, "alpha alpha alpha")).toDF("doc_id", "text")
    val a = graft.llm.LinearClassifier.classify(docs, "doc_id", "text", 4, 256)
      .orderBy("doc_id").collect()
    val b = graft.llm.LinearClassifier
      .classify(docs.repartition(7), "doc_id", "text", 4, 256)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    // empty text scores 0 for every class and predicts class 0 (first-max)
    val empty = a.find(_.getLong(0) == 3L).get
    assert((2 to 5).forall(i => empty.getLong(i) == 0L) && empty.getLong(6) == 0L)
    // token repetition scales the score linearly (bag semantics, not set)
    val alpha1 = a.find(_.getLong(0) == 1L).get
    val alpha3 = a.find(_.getLong(0) == 4L).get
    assert(alpha3.getLong(2) % 3 == 0)
    assert(alpha1.getLong(1) == 3 && alpha3.getLong(1) == 3)
  }

  test("classifier: first-max tie-break picks the lowest class index") {
    // single unknown token can't tie by construction, so force a tie:
    // classes=1 degenerates to always class 0; and with equal scores
    // (empty text) pred must be 0, not an arbitrary max
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    val r = graft.llm.LinearClassifier.classify(docs, "doc_id", "text", 4, 16)
      .collect()(0)
    assert(r.getLong(6) == 0L)
  }

  test("token budget: allocations are non-negative and sum exactly to T") {
    val r = SparkEntry.queries("q196_token_budget")(spark, sfDir)
      .agg(sum("alloc"), sum("extra"), min("alloc")).collect()(0)
    assert(r.getLong(0) == 1000000L)
    assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
  }

  test("ks gate: null accepted, scaled rejected at test scale") {
    val m = SparkEntry.queries("q194_ks_gate")(spark, sfDir)
      .select("arm", "rejected").as[(String, Boolean)].collect().toMap
    assert(!m("null") && m("scaled"))
  }

  test("acf gate: ma2 arm is strongly positive, raw arm is not") {
    val rows = SparkEntry.queries("q195_acf_gate")(spark, sfDir)
      .select("arm", "corr_pos", "strong")
      .as[(String, Boolean, Boolean)].collect()
    val (ma2, raw) = rows.partition(_._1 == "ma2")
    assert(ma2.nonEmpty && ma2.forall(r => r._2 && r._3))
    assert(raw.nonEmpty && raw.forall(r => !r._3))
  }

  test("cumulative distinct: monotone and ends at the true distinct count") {
    val df = SparkEntry.queries("q197_cumulative_distinct")(spark, sfDir)
    val perType = df.groupBy("event_type")
      .agg(max("cum_users").as("last"), sum("new_users").as("total"))
    assert(perType.filter(col("last") =!= col("total")).count() == 0)
    val truth = graft.util.Tables.t(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
    val joined = perType.join(truth, "event_type")
      .filter(col("last") =!= col("n"))
    assert(joined.count() == 0)
  }
}
