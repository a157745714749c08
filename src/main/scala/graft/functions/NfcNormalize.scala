package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the first step
  * of any web-scale text-dedup pipeline (the same logical document
  * arrives as composed 'é' from one crawler and 'e'+U+0301 from
  * another; without canonical composition, exact dedup keys, shingle
  * hashes, and token counts all silently split). Spark has no built-in
  * normalizer; this wraps the JDK's (Unicode-conformant) normalizer so
  * the hot path stays inside whole-stage codegen instead of a Scala
  * UDF with its serialization boundary. DuckDB replays it as
  * nfc_normalize() — same Unicode algorithm, byte-identical output —
  * which is the q255 oracle.
  *
  * Fast path: Normalizer.isNormalized is O(n) with no allocation and
  * true for virtually all real text (ASCII is always NFC), so the
  * allocating normalize() runs only on the rows that need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column form over a string column. */
  def apply(c: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(c.cast("string"))))
}
