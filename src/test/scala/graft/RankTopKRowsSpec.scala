package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types._

import graft.operators.RankTopKRows

/** Direct unit coverage of the tie-aware buffer: the rule spec proves
  * end-to-end equality with the window form; this spec exercises the
  * aggregate's own machinery — offer/shrink pruning, serialize →
  * deserialize → merge roundtrips under random chops — against a
  * brute-force model, independent of any plan. */
class RankTopKRowsSpec extends SparkTestBase {

  private def agg(k: Int, dense: Boolean) = RankTopKRows(
    exprs = Seq(BoundReference(0, IntegerType, nullable = true),
      BoundReference(1, LongType, nullable = false)),
    numSortKeys = 1, ascending = Seq(false), nullsFirst = Seq(false),
    k = k, dense = dense)

  private def row(v: Integer, id: Long): InternalRow =
    InternalRow(v, id)

  /** Brute-force rank model over (value desc nulls last, payload id). */
  private def expected(rows: Seq[(Integer, Long)], k: Int,
      dense: Boolean): Set[(Int, Option[Int], Long)] = {
    val sorted = rows.sortBy { case (v, _) =>
      if (v == null) (1, 0L) else (0, -v.toLong)
    }
    val keys = sorted.map(_._1)
    def keyRank(i: Int): Int =
      if (dense) keys.take(i + 1).distinct.size
      else keys.indexWhere(_ == keys(i)) + 1
    sorted.zipWithIndex.collect {
      case ((v, id), i) if keyRank(i) <= k =>
        (keyRank(i), Option(v).map(_.toInt), id)
    }.toSet
  }

  private def drain(a: RankTopKRows, buf: Any): Set[(Int, Option[Int], Long)] = {
    val arr = a.eval(buf.asInstanceOf[graft.operators.RankBuf])
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1)),
        r.getLong(2))
    }.toSet
  }

  test("random chops: update/serialize/deserialize/merge equal brute force") {
    for (seed <- 1 to 5; dense <- Seq(false, true); k <- Seq(1, 3)) {
      val rnd = new Random(seed)
      val rows: Seq[(Integer, Long)] = (0 until 120).map { i =>
        (if (rnd.nextInt(8) == 0) null
        else Int.box(rnd.nextInt(6)), i.toLong)
      }
      val a = agg(k, dense)
      // chop into 1-4 partial buffers, roundtrip each through bytes
      val chunks = rows.grouped(1 + rnd.nextInt(40)).toSeq
      val partials = chunks.map { ch =>
        val b = a.createAggregationBuffer()
        ch.foreach { case (v, id) => a.update(b, row(v, id)) }
        a.deserialize(a.serialize(b))
      }
      val merged = partials.reduce(a.merge)
      val got = drain(a, merged)
      val want = expected(rows, k, dense)
      assert(got == want, s"seed=$seed dense=$dense k=$k\n$got\nvs\n$want")
    }
  }

  test("all-tied input: rank keeps everything at k=1, dense too") {
    val a = agg(1, dense = false)
    val b = a.createAggregationBuffer()
    (0 until 50).foreach(i => a.update(b, row(7, i.toLong)))
    assert(drain(a, b).size == 50)
    assert(drain(a, b).forall(_._1 == 1))
  }
}
