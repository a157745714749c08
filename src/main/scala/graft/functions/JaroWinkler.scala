package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity in exact MICRO-UNITS
  * (round(jw * 1e6), LongType) — the entity-resolution scorer the
  * fuzzy-join family lacked (Levenshtein weighs deletions; JW rewards
  * shared prefixes, the right bias for names/titles).
  *
  * Why micro-units and not a double: jw is a small rational —
  * (m/l1 + m/l2 + (m−⌊t/2⌋)/m) / 3, Winkler-boosted — and this
  * expression evaluates that rational EXACTLY in integers before one
  * final rounded division by 10^6, so the published value is
  * bit-identical on any engine/partitioning. A double pipeline
  * (DuckDB's jaro_winkler_similarity, textbook implementations)
  * accumulates the three fractions in floating point, and ulp noise on
  * a re-run of a different engine is exactly the comparator seam that
  * broke q195/q199/q204 in round 11. Micro-units are far from double
  * rounding cliffs except when the true value lands on x.5 micro —
  * impossible here unless 3·m·l1·l2 divides 10^7·num with an odd
  * quotient, which the gating spec checks empirically against DuckDB
  * over the full corpus.
  *
  * Semantics pinned to DuckDB's jaro_winkler_similarity (the oracle),
  * established empirically against ~180k part-name pairs with zero
  * divergence: case-sensitive; 0 if either side is empty (even
  * both-empty); match window ⌊max/2⌋−1; transpositions FLOORED to
  * ⌊t/2⌋ (textbook JW keeps the exact half — that variant disagrees
  * with DuckDB whenever t is odd); Winkler boost p=0.1, prefix cap 4,
  * applied when jaro ≥ 0.7 (non-strict — pairs at exactly 0.7 do get
  * boosted). Verified fixtures in JaroWinklerSpec.
  *
  * Codegen emits a static call — the O(l1·l2) matching loop cannot
  * inline, but the expression stays inside whole-stage codegen with no
  * row boxing. Long arithmetic while max(l1,l2) ≤ 2896 (worst-case
  * numerator ×2·10^6 still < 2^63), BigInt beyond.
  */
case class JaroWinklerMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerMicro.micro(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerMicro.micro($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerMicro =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler_micro"
}

object JaroWinklerMicro {

  /** round(jaro_winkler(a, b) * 1e6), exact-rational. Operates on
    * UTF-16 chars (== code points for BMP text; the corpus is ASCII). */
  def micro(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0L
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val from = math.max(0, i - win)
      val to = math.min(l2 - 1, i + win)
      var j = from
      var done = false
      while (j <= to && !done) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // raw transposition count t; DuckDB floors the half-count
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    // common-prefix length, Winkler cap 4
    var ell = 0
    while (ell < 4 && ell < l1 && ell < l2 &&
      a.charAt(ell) == b.charAt(ell)) ell += 1
    val t2 = t / 2
    if (math.max(l1, l2) <= 2896) {
      val L1 = l1.toLong; val L2 = l2.toLong; val M = m.toLong
      // jaro = num/den over the common denominator 3·m·l1·l2
      val num = M * M * L2 + M * M * L1 + (M - t2) * L1 * L2
      val den = 3L * M * L1 * L2
      // boost iff jaro >= 0.7 (non-strict, matching DuckDB)
      val (n2, d2) =
        if (10L * num >= 7L * den)
          (num * (10L - ell) + ell * den, 10L * den)
        else (num, den)
      // round half away from zero: floor((2·n·10^6 + d) / (2·d))
      (2L * n2 * 1000000L + d2) / (2L * d2)
    } else {
      val L1 = BigInt(l1); val L2 = BigInt(l2); val M = BigInt(m)
      val num = M * M * L2 + M * M * L1 + (M - t2) * L1 * L2
      val den = 3 * M * L1 * L2
      val (n2, d2) =
        if (10 * num >= 7 * den)
          (num * (10 - ell) + ell * den, 10 * den)
        else (num, den)
      ((2 * n2 * 1000000 + d2) / (2 * d2)).toLong
    }
  }

  /** Column form over two string columns. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinklerMicro(
      ColumnShim.expression(a.cast("string")),
      ColumnShim.expression(b.cast("string"))))
}
