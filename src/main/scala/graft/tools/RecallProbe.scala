package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Ann, Pq}

/** Dev tool: measure candidate recall of each approximate ANN path vs the
  * exact brute-force baseline at a given SF dir — the evidence behind the
  * oracle-checked full-recall parameterizations of q75/q82/q86. Run:
  * `sbt "runMain graft.tools.RecallProbe /root/testdata/sf0.01"`.
  */
object RecallProbe {
  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recall(approx: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    if (truth.isEmpty) 1.0 else approx.intersect(truth).size.toDouble / truth.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def report(name: String, qFilter: org.apache.spark.sql.Column,
        approx: DataFrame, k: Int): Unit = {
      val truth = pairs(Ann.bruteForceTopK(emb, emb.filter(qFilter), k))
      println(f"$name%-40s recall=${recall(pairs(approx), truth)}%.4f")
    }

    for (nt <- Seq(1, 4, 8, 16))
      report(s"q75 lsh nBits=6 multiProbe nTables=$nt", col("vec_id") < 50,
        Ann.lshTopK(emb, emb.filter(col("vec_id") < 50), k = 3, nBits = 6,
          nTables = nt), 3)
    for (np <- Seq(4, 6, 8, 12))
      report(s"q82 ivf nCells=16 nProbe=$np", col("vec_id") < 20,
        Ann.ivfTopK(emb, emb.filter(col("vec_id") < 20), k = 3, nCells = 16,
          nProbe = np), 3)
    for (rf <- Seq(16, 32, 64))
      report(s"q86 pq m=8 ksub=16 refine=$rf", col("vec_id") < 20,
        Pq.pqTopK(emb, emb.filter(col("vec_id") < 20), k = 3, dim = 64,
          m = 8, ksub = 16, refine = rf), 3)
    spark.stop()
  }
}
