package graft

import graft.llm.Coreset

/** Farthest-point sampling (q301's operator): the greedy k-center
  * selection must spread picks across well-separated clusters before
  * refining inside any one, the coverage-radius curve must be
  * non-increasing, and the whole selection must be a deterministic
  * pure function of the input (no RNG state). */
class CoresetSpec extends SparkTestBase {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) =>
        Row(id, v)
      }, 2),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  test("picks cover well-separated clusters before refining inside one") {
    // three clusters at (0,0), (10,10), (-10, 10); 4 points each,
    // jittered by 0.1 — FPS with k=3 must take one point per cluster
    val pts = for {
      (cx, cy, base) <- Seq((0f, 0f, 0L), (10f, 10f, 10L), (-10f, 10f, 20L))
      j <- 0 until 4
    } yield (base + j, Seq(cx + 0.1f * j, cy - 0.1f * j))
    val got = Coreset.farthestPoints(spark, vecs(pts), k = 3)
      .collect().map(r => r.getLong(1) / 10).toSet
    assert(got == Set(0L, 1L, 2L), s"picks missed a cluster: $got")
  }

  test("coverage-radius curve is non-increasing from pick 2") {
    val e = graft.util.Tables.t(spark, sfDir, "embeddings")
    val radii = Coreset.farthestPoints(spark, e, k = 6)
      .orderBy("pick").collect().map(_.getLong(2)).drop(1)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radius curve increased: ${radii.mkString(",")}")
  }

  test("selection is deterministic across runs") {
    val e = graft.util.Tables.t(spark, sfDir, "embeddings")
    def run() = Coreset.farthestPoints(spark, e, k = 5)
      .orderBy("pick").collect().map(r => (r.getInt(0), r.getLong(1),
        r.getLong(2))).toSeq
    assert(run() == run())
  }

  test("empty input fails loudly; k past n caps at n without duplicates") {
    val ex = intercept[IllegalArgumentException] {
      Coreset.farthestPoints(spark, vecs(Nil), k = 3)
    }
    assert(ex.getMessage.contains("empty"), s"opaque error: ${ex.getMessage}")
    // 3 vectors, k=10 → exactly 3 picks, all distinct
    val pts = Seq((1L, Seq(0f, 0f)), (2L, Seq(5f, 0f)), (3L, Seq(0f, 5f)))
    val got = Coreset.farthestPoints(spark, vecs(pts), k = 10)
      .collect().map(_.getLong(1)).toSeq
    assert(got.size == 3 && got.distinct.size == 3, s"duplicate picks: $got")
  }
}
