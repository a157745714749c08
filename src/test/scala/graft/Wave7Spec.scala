package graft

import org.apache.spark.sql.functions._

/** Wave-7 invariants: perceptual image hashing (q200). */
class Wave7Spec extends SparkTestBase {

  private val V = 1000000000L

  test("phash: every planted color-rotated dup hashes identically; byte digests differ") {
    val docs = graft.util.Tables.t(spark, sfDir, "documents").select("doc_id")
    val media = graft.llm.Multimodal.syntheticPngPairMedia(spark, docs, V)
    val hashed = graft.llm.Multimodal.imageAHash(spark, media).toDF()
    val base = hashed.filter(col("doc_id") < V)
      .select(col("doc_id").as("b"), col("ahash").as("ha"))
    val dup = hashed.filter(col("doc_id") >= V)
      .select((col("doc_id") - V).as("b"), col("ahash").as("hd"))
    val pairs = base.join(dup, "b")
    assert(pairs.count() > 0)
    assert(pairs.filter(col("ha") =!= col("hd")).count() == 0,
      "a planted perceptual dup got a different aHash")
    // the same pairs are byte-wise DIFFERENT images — a content digest
    // (the q70 exact-dedup key) must not equate them
    val dig = media.select(col("doc_id"), sha2(col("payload"), 256).as("d"))
    val dpairs = dig.filter(col("doc_id") < V)
      .select(col("doc_id").as("b"), col("d").as("da"))
      .join(dig.filter(col("doc_id") >= V)
        .select((col("doc_id") - V).as("b"), col("d").as("dd")), "b")
    assert(dpairs.filter(col("da") === col("dd")).count() == 0)
  }

  test("phash is invariant under uniform brightness shift of decoded pixels") {
    // +1 per channel shifts every cell sum by 3·n_c and the total by
    // 3·N — the cross-multiplied bit comparison is unchanged
    import spark.implicits._
    val docs = Seq(7L, 42L).toDF("doc_id")
    val media = graft.llm.Multimodal.syntheticPngPairMedia(spark, docs, V)
    val shifted = media.as[graft.llm.Multimodal.MediaRow].map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        val rr = math.min(((p >> 16) & 0xff) + 1, 255)
        val gg = math.min(((p >> 8) & 0xff) + 1, 255)
        val bb = math.min((p & 0xff) + 1, 255)
        out.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      graft.llm.Multimodal.MediaRow(r.doc_id, bos.toByteArray, r.media_type)
    }.toDF()
    val h1 = graft.llm.Multimodal.imageAHash(spark, media).toDF()
      .select(col("doc_id"), col("ahash").as("h1"))
    val h2 = graft.llm.Multimodal.imageAHash(spark, shifted).toDF()
      .select(col("doc_id"), col("ahash").as("h2"))
    // pixels stay ≤ 254 for these doc ids' formulas only if no channel
    // saturates; assert equality where the clamp never fired (all three
    // formulas stay < 255 for small x, y — verified by the join itself)
    val diff = h1.join(h2, "doc_id").filter(col("h1") =!= col("h2"))
    assert(diff.count() == 0)
  }
}
