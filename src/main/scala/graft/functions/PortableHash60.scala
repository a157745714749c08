package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine-portable 60-bit md5 token
  * hash — bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)`
  * (the first 15 hex digits of the digest as an integer) but computed
  * straight from the digest bytes: no 32-char hex string allocation,
  * no substring, no base-16 string parse per token. The md5 itself is
  * the irreducible cost; this removes the two string round-trips
  * around it on every shingle/token of the MinHash, SimHash, BM25 and
  * classifier portable paths.
  *
  * Codegen emits a static call (the digest loop cannot inline into
  * generated Java, but the expression stays inside the whole-stage
  * pipeline with no row-boxing). DuckDB replays it as
  * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)` — the oracle SQL
  * is unchanged because the VALUE is unchanged (PortableHash60Spec
  * asserts equality against the functions-API derivation).
  */
case class PortableHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    PortableHash60.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableHash60 =
    copy(child = newChild)

  override def prettyName: String = "portable_hash60"
}

object PortableHash60 {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s) as a non-negative long — the integer value
    * of the digest's first 15 hex digits (7 full bytes + the high
    * nibble of byte 7). */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    (h << 4) | ((digest(7) >> 4) & 0xfL)
  }

  /** Column form over a string column. */
  def apply(c: Column): Column =
    ColumnShim.column(PortableHash60(ColumnShim.expression(c.cast("string"))))
}
