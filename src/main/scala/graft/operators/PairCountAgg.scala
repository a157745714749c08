package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Fused neighbor-count + selection aggregate for (a, b) pair tables.
  *
  * The two-step formulation — `groupBy(a, b).count()` followed by a
  * second pass over the counted pairs (`groupBy(a).topK` or a support
  * filter + join) — pays a full Exchange on (a, b) AND a second
  * aggregate/exchange on (a). Per group `a` this aggregate folds both
  * steps into ONE exchange keyed on `a`: the buffer is a b → n count
  * map (map-side combined exactly like the partial (a, b) counts were,
  * so the shuffle carries the same distinct-pair entries, just grouped
  * per `a`), and eval applies the selection — entries with n ≥ `minN`,
  * best-first by (n DESC, b ASC), at most `k` of them.
  *
  * Buffer size per (task, a) is the group's distinct-neighbor count —
  * the same working set the hash aggregate on (a, b) held; nothing new
  * is materialized. Selection semantics at eval:
  *   - k > 0:   the TopKAgg heap contract — top k by (n DESC, b ASC)
  *   - minN > 1: only neighbors seen at least minN times survive
  */
case class PairCountSelect(
    bExpr: Expression,
    k: Int,
    minN: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  require(k >= 0, "k must be >= 0 (0 = keep all)")

  override def child: Expression = bExpr

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val b = bExpr.eval(input)
    if (b != null) {
      val key = b.asInstanceOf[Long]
      buf(key) = buf.getOrElse(key, 0L) + 1L
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long],
      b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreach { case (key, n) => b1(key) = b1.getOrElse(key, 0L) + n }
    b1
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    var kept = buf.iterator.filter(_._2 >= minN).toArray
    // (n DESC, b ASC) — the TopKAgg heap's deterministic order
    kept = kept.sortBy { case (b, n) => (-n, b) }
    if (k > 0 && kept.length > k) kept = kept.take(k)
    new GenericArrayData(kept.map { case (b, n) =>
      new GenericInternalRow(Array[Any](b, n))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (b, n) => bb.putLong(b); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf(bb.getLong) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): PairCountSelect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PairCountSelect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PairCountSelect =
    copy(bExpr = newChild)
  override def prettyName: String = "pair_count_select"
}

object PairCountAgg {
  /** Per group: the k most frequent `b` values as array<struct<b,n>>,
    * best-first by (count DESC, b ASC). Fuses `groupBy(a,b).count` +
    * `groupBy(a).topK` into one exchange. */
  def pairTopK(b: Column, k: Int): Column =
    ColumnShim.column(PairCountSelect(
      ColumnShim.expression(b.cast("long")), k, 1L).toAggregateExpression())

  /** Per group: every `b` value seen at least `minN` times, with its
    * count, ordered (count DESC, b ASC). Fuses `groupBy(a,b).count` +
    * a support filter into one exchange. */
  def countsAtLeast(b: Column, minN: Long): Column =
    ColumnShim.column(PairCountSelect(
      ColumnShim.expression(b.cast("long")), 0, minN).toAggregateExpression())
}
