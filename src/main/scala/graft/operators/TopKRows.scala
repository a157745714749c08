package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native grouped top-k over FULL ROWS with an arbitrary multi-key
  * sort order — the generalization of [[TopKByValue]] that
  * [[graft.plans.WindowTopKRewrite]] rewrites window-top-k queries
  * onto. Each group keeps a bounded heap of its k first rows under
  * `ordering` (direction + null ordering per key, exactly window
  * ORDER BY semantics), so a map task contributes at most k rows per
  * group to the shuffle and nothing ever sorts more than k elements —
  * versus the window formulation, which shuffles and sorts EVERY row
  * of every group before discarding all but k. Evaluates to
  * array<struct> of the kept rows, best-first (sort keys first, then
  * the payload columns).
  *
  * exprs = sortKeys ++ payload; `ascending`/`nullsFirst` align with
  * the first `numSortKeys` exprs. Rows with null sort keys are KEPT
  * and ranked by the null ordering, matching row_number.
  */
case class TopKRows(
    exprs: Seq[Expression],
    numSortKeys: Int,
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, "k must be positive")
  require(numSortKeys > 0 && numSortKeys <= exprs.length)
  require(ascending.length == numSortKeys && nullsFirst.length == numSortKeys)

  override def children: Seq[Expression] = exprs

  private lazy val rowSchema = StructType(exprs.zipWithIndex.map {
    case (e, i) =>
      val name = if (i < numSortKeys) s"s$i" else s"c${i - numSortKeys}"
      StructField(name, e.dataType, e.nullable)
  })

  /** Best-first ordering over buffered rows (the window's ORDER BY). */
  private lazy val bestFirst: Ordering[InternalRow] = new InterpretedOrdering(
    (0 until numSortKeys).map { i =>
      SortOrder(BoundReference(i, exprs(i).dataType, exprs(i).nullable),
        if (ascending(i)) Ascending else Descending,
        if (nullsFirst(i)) NullsFirst else NullsLast, Seq.empty)
    })
  // Scala's PriorityQueue dequeues the MAXIMUM under its ordering, and
  // the maximum under bestFirst (ascending = best-first) is the WORST
  // kept row — exactly what a bounded top-k heap evicts.

  private lazy val project = UnsafeProjection.create(exprs)
  private lazy val fromSchema =
    UnsafeProjection.create(rowSchema.fields.map(_.dataType))

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty(bestFirst)

  private def offer(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow): Unit = {
    if (buf.size < k) buf.enqueue(row)
    else if (bestFirst.compare(row, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(row)
    }
  }

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    // project → UnsafeRow (reused) → copy only when the row is kept
    val projected = project(input)
    if (buf.size < k || bestFirst.compare(projected, buf.head) < 0)
      offer(buf, projected.copy())
    buf
  }

  override def merge(b1: mutable.PriorityQueue[InternalRow],
      b2: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(
      buf.toArray.sorted(bestFirst).asInstanceOf[Array[Any]])

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray.map {
      case u: UnsafeRow => u
      // .copy(): fromSchema reuses one projection buffer — without it,
      // multiple fallback rows would alias the last row's bytes
      // (unreachable today: the buffer only holds UnsafeRow copies from
      // update/deserialize — but latent corruption, and RankTopKRows
      // copies)
      case r => fromSchema(r).copy()
    }
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { u =>
      bb.putInt(u.getSizeInBytes)
      u.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
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

  override def dataType: DataType =
    ArrayType(rowSchema, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(exprs = newChildren)
  override def prettyName: String = "topk_rows"
}
