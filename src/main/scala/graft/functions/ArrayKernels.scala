package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd array kernels for the ANN/k-means hot paths,
  * generalizing [[DotProductF32]] to FLOAT and DOUBLE element types
  * (chosen per input side at bind time, so float-embedding ×
  * double-centroid works without a per-row cast of the whole array).
  *
  * Both kernels accumulate in double with the same sequential
  * left-to-right order as the `zip_with`+`aggregate` HOF chains they
  * replace (`Ann.dotDouble`, `Pq.l2`), so results are bit-identical
  * and they can drop into existing prefilters unchanged. The HOF chain
  * allocates an intermediate array per row and walks two lambdas —
  * per-candidate cost that dominates k-means assignment and candidate
  * pruning at scale.
  *
  * PRECONDITION (hot-path contract, deliberately unchecked per row):
  * both arrays must have the same length and contain no null elements.
  * On mismatched lengths the kernels fold over the first min(n)
  * elements, where the HOF chain's zip_with null-pads and yields NULL;
  * a null element is read as the raw slot value instead of propagating
  * null. Every caller in this library (k-means assignment, ADC/re-rank
  * prefilters, LSH plane dots) meets the precondition by construction:
  * fixed-dim embeddings / codebooks with non-null elements. Wrong
  * input TYPES fail at analysis time via [[checkInputDataTypes]].
  */
trait ArrayKernel extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double> on both sides, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $t")
  }

  protected def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Per-element combine in interpreted eval. */
  protected def combine(x: Double, y: Double): Double

  /** Java source for the per-element combine in codegen. */
  protected def combineCode(x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += combine(get(x, lf, i), get(y, rf, i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = if (elemIsFloat(left)) s"(double) $a.getFloat" else s"$a.getDouble"
      val rb = if (elemIsFloat(right)) s"(double) $b.getFloat" else s"$b.getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $la($i);
         |  double $yv = $rb($i);
         |  $sum += ${combineCode(xv, yv)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
}

/** dot_arr(a, b): double dot product over float/double arrays. */
case class DotArr(left: Expression, right: Expression) extends ArrayKernel {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotArr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_arr"
}

/** dist2_arr(a, b): squared L2 distance over float/double arrays. */
case class Dist2Arr(left: Expression, right: Expression) extends ArrayKernel {
  override protected def combine(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def combineCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2Arr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dist2_arr"
}

object ArrayKernels {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnShim

  /** Column-level kernels (no SQL registration needed). */
  def dotArr(a: Column, b: Column): Column =
    ColumnShim.column(DotArr(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  def dist2Arr(a: Column, b: Column): Column =
    ColumnShim.column(Dist2Arr(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Register as SQL-callable `dot_arr(a, b)` / `dist2_arr(a, b)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_arr", exprs => DotArr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dist2_arr", exprs => Dist2Arr(exprs(0), exprs(1)), "scala_udf")
  }
}
