package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — d×w counters over
  * an unbounded key domain; the OVER-estimating dual of the Misra–Gries
  * summary (q164): est(x) = min_d cell(d, h_d(x)) ≥ n(x), with
  * est(x) ≤ n(x) + εN (ε = e/w) w.p. 1−δ (δ = e^−d).
  *
  * Unlike Misra–Gries, the sketch CONTENTS are fully deterministic:
  * every cell is a plain sum over the keys that hash into it, so merge
  * order cannot matter and the oracle can replay each cell exactly as
  * `SUM(count) WHERE md5-position = cell`. Hashing matches
  * `BqShims.md5Bucket` bit-for-bit (first 8 md5 hex digits of
  * `key·"#"·d` as a decimal long, mod w) so both engines compute the
  * same cells AND the same estimates — no probabilistic gate needed.
  *
  * Scale shape: constant d·w-long buffer per partition; the shuffle
  * carries one fixed-size array per map task regardless of key
  * cardinality — the sketch a 100 TB scan can afford when exact
  * per-key counts would blow the aggregation hash.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && width > 0)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      var d = 0
      while (d < depth) {
        buf(d * width + CountMin.position(key, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
  override def prettyName: String = "count_min"
}

object CountMin {

  /** JVM replica of `BqShims.md5Bucket(concat(key, '#', d)) pmod w` —
    * first 4 md5 bytes as an unsigned 32-bit value, mod w. */
  def position(key: String, d: Int, width: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val h = md.digest((key + "#" + d).getBytes(StandardCharsets.UTF_8))
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (u % width).toInt
  }

  /** The flattened d×w sketch of a key column (row d at [d*w, d*w+w)). */
  def sketch(key: Column, depth: Int, width: Int): Column =
    ColumnShim.column(
      CountMinAgg(ColumnShim.expression(key.cast("string")), depth, width)
        .toAggregateExpression())

  /** Point estimate for a key against a sketch column: min over rows of
    * the key's cell — SQL-side, so the oracle replays it cell-by-cell.
    * (1-based element_at over the flattened array.) */
  def estimate(sketchCol: Column, key: Column, depth: Int,
      width: Int): Column = {
    val cells = (0 until depth).map { d =>
      org.apache.spark.sql.functions.element_at(sketchCol,
        org.apache.spark.sql.functions.pmod(
          graft.functions.BqShims.md5Bucket(
            org.apache.spark.sql.functions.concat(key.cast("string"),
              org.apache.spark.sql.functions.lit("#" + d))),
          org.apache.spark.sql.functions.lit(width.toLong))
          .cast("int") + org.apache.spark.sql.functions.lit(d * width + 1))
    }
    org.apache.spark.sql.functions.least(cells: _*)
  }
}
