package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary — k counters over an unbounded
  * key domain, the frequent-items sketch a 100 TB scan can afford when
  * exact per-key counts would blow the aggregation hash. Guarantees
  * (Misra–Gries 1982; mergeability: Agarwal et al., PODS 2012):
  *
  *   - estimate is a LOWER bound: est(x) ≤ n(x)
  *   - error ≤ N/(k+1): n(x) − est(x) ≤ N/(k+1)
  *   - completeness: every x with n(x) > N/(k+1) IS in the summary
  *
  * The summary CONTENTS depend on merge order (not deterministic under
  * repartitioning) — so, per the q133 rule, queries publish the
  * deterministic GUARANTEES (booleans + exact counts), never the raw
  * sketch. Merge subtracts the (k+1)-th largest count from all (the
  * PODS-2012 mergeable reduction), keeping the error bound additive.
  *
  * Scale shape: constant k-entry buffer per partition, partial-agg
  * shuffle carries ≤ k (key,count) pairs per map task.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def shrink(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val m = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      buf.keys.toArray.foreach { key =>
        val v = buf(key) - m
        if (v <= 0) buf.remove(key) else buf.update(key, v)
      }
    }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
      shrink(buf)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) =>
      b1.update(key, b1.getOrElse(key, 0L) + c)
    }
    shrink(b1)
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy(_._1)
    ArrayBasedMapData(sorted.map(e => UTF8String.fromString(e._1)),
      sorted.map(_._2))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** map<key, lower-bound-count> summary column with k counters. */
  def summary(key: Column, k: Int): Column =
    ColumnShim.column(
      MisraGriesAgg(ColumnShim.expression(key.cast("string")), k)
        .toAggregateExpression())
}
