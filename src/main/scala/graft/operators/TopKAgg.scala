package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native partial top-k aggregate — per group, the k largest
  * (value, id) pairs by (value DESC, id ASC), computed with a bounded
  * heap INSIDE the aggregation.
  *
  * The textbook formulation (`row_number() OVER (PARTITION BY g ORDER
  * BY v DESC) <= k`) shuffles EVERY row to its group's partition and
  * sorts the whole group just to throw away all but k rows. This
  * aggregate keeps at most k entries per group per map task, so the
  * shuffle carries ≤ k·groups·tasks entries instead of the full table,
  * and no sort ever sees more than k elements per group — the
  * difference between shuffling 100 TB and shuffling megabytes when k
  * is small. (Same motivation as Spark's own `TakeOrderedAndProject`,
  * which only exists for GLOBAL limits — this is the grouped form.)
  *
  * Buffer is a min-heap keyed worst-first, serialized as flat
  * (double, long) pairs for the partial-aggregate shuffle.
  */
case class TopKByValue(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = valueExpr
  override def right: Expression = idExpr

  // dequeue removes the WORST entry: lowest value, then highest id
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      offer(buf, (v.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending in worstFirst = best entries first (greater = worse)
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, id) => bb.putDouble(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { offer(buf, (bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKByValue =
    copy(valueExpr = newLeft, idExpr = newRight)
  override def prettyName: String = "topk_by_value"
}

object TopKAgg {
  /** Aggregate column: array<struct<value,id>> of the group's top k,
    * best-first by (value DESC, id ASC). */
  def topK(value: Column, id: Column, k: Int): Column =
    ColumnShim.column(
      TopKByValue(ColumnShim.expression(value.cast("double")),
        ColumnShim.expression(id.cast("long")), k).toAggregateExpression())
}
