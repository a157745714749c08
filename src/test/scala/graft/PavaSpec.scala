package graft

import graft.operators.Isotonic

/** Isotonic minimax identity (q316's operator) vs a sequential PAV
  * reference: equivalence by property, monotonicity, identity on
  * already-monotone input, block-mean preservation. */
class PavaSpec extends SparkTestBase {
  import spark.implicits._

  /** Textbook sequential pool-adjacent-violators on (n, pos) bins. */
  private def pavReference(bins: Seq[(Long, Long)]): Seq[Double] = {
    case class Block(n: Long, pos: Long, size: Int) {
      def avg: Double = pos.toDouble / n.toDouble
    }
    val stack = scala.collection.mutable.Stack[Block]()
    bins.foreach { case (n, pos) =>
      var b = Block(n, pos, 1)
      while (stack.nonEmpty && stack.top.avg >= b.avg) {
        val t = stack.pop()
        b = Block(t.n + b.n, t.pos + b.pos, t.size + b.size)
      }
      stack.push(b)
    }
    stack.toSeq.reverse.flatMap(b => Seq.fill(b.size)(b.avg))
  }

  private def run(bins: Seq[(Long, Long)]): Seq[Double] =
    Isotonic.fitBins(bins.zipWithIndex
        .map { case ((n, p), i) => (i.toLong, n, p) }
        .toDF("bin", "n", "pos"))
      .orderBy("bin").collect().map(_.getDouble(4)).toSeq

  test("minimax identity == sequential PAV (property, 30 random bin sets)") {
    val rnd = new scala.util.Random(316L)
    for (trial <- 1 to 30) {
      val bins = (1 to (3 + rnd.nextInt(12))).map { _ =>
        val n = 1L + rnd.nextInt(50)
        (n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val got = run(bins)
      val want = pavReference(bins)
      // PAV's pooled averages are sums-then-divide; the minimax picks
      // the same intervals, so the doubles are identical divisions
      assert(got == want, s"trial $trial: $bins\n got  $got\n want $want")
    }
  }

  test("already-monotone rates pass through untouched (pooled = false)") {
    val rows = Isotonic.fitBins(
      Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L)).toDF("bin", "n", "pos"))
      .orderBy("bin").collect()
    assert(rows.map(_.getDouble(4)).toSeq == Seq(0.1, 0.5, 0.9))
    assert(rows.forall(!_.getBoolean(5)))
  }

  test("fitted sequence is monotone and pooling preserves block means") {
    val bins = Seq((10L, 8L), (10L, 2L), (10L, 5L), (10L, 9L))
    val got = run(bins)
    assert(got.zip(got.tail).forall { case (a, b) => a <= b }, s"$got")
    // pooled [8,2,5]/30 = 0.5 then 0.9
    assert(got == Seq(0.5, 0.5, 0.5, 0.9), s"$got")
  }
}
