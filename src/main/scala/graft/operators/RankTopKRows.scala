package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, GenericInternalRow, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Buffer: rows grouped by sort key in key order + total row count. */
private[graft] final class RankBuf(
    val groups: java.util.TreeMap[InternalRow, mutable.ArrayBuffer[InternalRow]]) {
  var total: Long = 0L
}

/** Tie-aware grouped top-k for rank()/dense_rank() filters — the
  * companion of [[TopKRows]] (which serves row_number). rank ≤ k must
  * keep EVERY row tied into the boundary (possibly more than k rows),
  * so the buffer is key-grouped: a TreeMap from sort key to that
  * key's rows, shrunk from the worst end while the prune condition
  * provably holds —
  *   rank:       drop the last key group while the rows before it
  *               already number ≥ k (its rank ≥ k+1);
  *   dense_rank: drop while there are more than k distinct keys.
  * State is k groups + boundary ties — bounded by k·(max tie width),
  * the same bound Spark's own WindowGroupLimit carries for rank.
  *
  * eval emits array<struct(rk, payload…)> with the rank VALUE computed
  * inside the aggregate (the full sorted group is in hand), so the
  * rewrite needs no second window to reconstruct it.
  */
case class RankTopKRows(
    exprs: Seq[Expression],
    numSortKeys: Int,
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    k: Int,
    dense: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RankBuf] {

  require(k > 0, "k must be positive")
  require(numSortKeys > 0 && numSortKeys <= exprs.length)

  override def children: Seq[Expression] = exprs

  private lazy val rowSchema = StructType(exprs.zipWithIndex.map {
    case (e, i) =>
      val name = if (i < numSortKeys) s"s$i" else s"c${i - numSortKeys}"
      StructField(name, e.dataType, e.nullable)
  })

  /** Orders rows by SORT KEY fields only (ties compare equal — that is
    * what groups them in the TreeMap). */
  private lazy val keyOrdering: Ordering[InternalRow] = new InterpretedOrdering(
    (0 until numSortKeys).map { i =>
      SortOrder(BoundReference(i, exprs(i).dataType, exprs(i).nullable),
        if (ascending(i)) Ascending else Descending,
        if (nullsFirst(i)) NullsFirst else NullsLast, Seq.empty)
    })

  private lazy val project = UnsafeProjection.create(exprs)
  private lazy val fromSchema =
    UnsafeProjection.create(rowSchema.fields.map(_.dataType))

  override def createAggregationBuffer(): RankBuf =
    new RankBuf(new java.util.TreeMap[InternalRow, mutable.ArrayBuffer[InternalRow]](
      new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          keyOrdering.compare(a, b)
      }))

  private def shrink(buf: RankBuf): Unit = {
    if (dense) {
      while (buf.groups.size > k) {
        val last = buf.groups.pollLastEntry()
        buf.total -= last.getValue.size
      }
    } else {
      var done = false
      while (!done && buf.groups.size > 1) {
        val last = buf.groups.lastEntry()
        if (buf.total - last.getValue.size >= k) {
          buf.groups.pollLastEntry()
          buf.total -= last.getValue.size
        } else done = true
      }
    }
  }

  private def offer(buf: RankBuf, row: InternalRow): Unit = {
    val existing = buf.groups.get(row)
    if (existing != null) existing += row
    else {
      // fast reject: row would land beyond the already-full boundary
      if (!buf.groups.isEmpty) {
        val worst = buf.groups.lastKey()
        val cmp = keyOrdering.compare(row, worst)
        if (cmp > 0) {
          val full =
            if (dense) buf.groups.size >= k
            else buf.total >= k
          if (full) return
        }
      }
      buf.groups.put(row, mutable.ArrayBuffer(row))
    }
    buf.total += 1
    shrink(buf)
  }

  override def update(buf: RankBuf, input: InternalRow): RankBuf = {
    offer(buf, project(input).copy())
    buf
  }

  override def merge(b1: RankBuf, b2: RankBuf): RankBuf = {
    val it = b2.groups.values().iterator()
    while (it.hasNext) it.next().foreach(offer(b1, _))
    b1
  }

  override def eval(buf: RankBuf): Any = {
    val out = mutable.ArrayBuffer.empty[Any]
    var seen = 0L
    var denseRk = 0
    val it = buf.groups.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      denseRk += 1
      val rk = if (dense) denseRk else (seen + 1).toInt
      if (rk <= k) {
        e.getValue.foreach { r =>
          val vals = new Array[Any](1 + exprs.length)
          vals(0) = rk
          var i = 0
          while (i < exprs.length) {
            vals(i + 1) = r.get(i, exprs(i).dataType)
            i += 1
          }
          out += new GenericInternalRow(vals)
        }
      }
      seen += e.getValue.size
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: RankBuf): Array[Byte] = {
    val rows = mutable.ArrayBuffer.empty[UnsafeRow]
    val it = buf.groups.values().iterator()
    while (it.hasNext) it.next().foreach {
      case u: UnsafeRow => rows += u
      case r => rows += fromSchema(r).copy()
    }
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { u => bb.putInt(u.getSizeInBytes); u.writeTo(bb) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): RankBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val slice = new Array[Byte](len)
      bb.get(slice)
      val row = new UnsafeRow(exprs.length)
      row.pointTo(slice, len)
      offer(buf, row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(StructField("rk", IntegerType, nullable = false) +:
      rowSchema.fields.toSeq), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): RankTopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RankTopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RankTopKRows =
    copy(exprs = newChildren)
  override def prettyName: String =
    if (dense) "dense_rank_topk_rows" else "rank_topk_rows"
}
