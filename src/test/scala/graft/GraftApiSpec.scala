package graft

import org.apache.spark.sql.functions._

/** The facade is pure re-export — this spec just pins that the
  * advertised names exist and flow through to the real operators. */
class GraftApiSpec extends SparkTestBase {
  import spark.implicits._

  test("facade members delegate to the gated operators") {
    import graft.api.Graft._
    val docs = Seq((1L, "the cat sat"), (2L, "the cat sat"),
      (3L, "entirely different words here")).toDF("doc_id", "text")
    // expression re-exports
    val h = docs.select(portableHash60(col("text")).as("h"),
      nfcNormalize(col("text")).as("n"),
      jaroWinklerMicro(col("text"), col("text")).as("jw")).collect()
    assert(h.forall(_.getLong(2) == 1000000L))
    // operator object re-exports are the SAME singletons
    assert(textDedup eq graft.llm.TextDedup)
    assert(kneserNey eq graft.llm.KneserNey)
    assert(streams eq graft.streaming.StreamOps)
    assert(windowTopK eq graft.plans.WindowTopKRewrite)
    // one end-to-end flow through the facade
    val model = kneserNey.bigramModel(docs, col("doc_id"), col("text"))
    assert(model.filter(col("w1") === "the" && col("w2") === "cat")
      .head.getAs[Long]("c") == 2L)
  }
}
