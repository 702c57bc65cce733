package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity — the record-linkage string metric
  * (Winkler 1990, public) complementing levenshtein for short keys:
  * order-sensitive but transposition-tolerant, with a common-prefix
  * boost that matches how names/titles/URLs actually corrupt.
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (empirically
  * fuzz-verified, 2000/2000 exact):
  *   - match window `max(|a|,|b|)/2 − 1` (floored, min 0);
  *   - HALF-TRANSPOSITIONS FLOORED: `t = mismatches/2` as an integer —
  *     the rapidfuzz convention DuckDB inherits, NOT the textbook
  *     `mismatches/2.0` (odd mismatch counts differ by 1/(2m)·1/3);
  *   - prefix boost `ℓ·0.1·(1−jaro)`, ℓ ≤ 4, applied only when
  *     jaro > 0.7;
  *   - either side empty → 0.0 (including both empty — DuckDB's
  *     convention, not the common `1.0`).
  *
  * Per-row kernel over UTF-16 code units (≡ codepoints on BMP text;
  * DuckDB walks UTF-8 codepoints, so supplementary-plane characters
  * would diverge — ASCII/BMP keys only, which is the record-linkage
  * use), zero shuffles; codegen'd call into the static kernel like
  * [[TextNormKernel]]. */
object JaroWinklerKernel {

  def jw(a: UTF8String, b: UTF8String): Double =
    jwStr(a.toString, b.toString)

  def jwStr(s: String, t: String): Double = {
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sm = new Array[Boolean](ls)
    val tm = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && s.charAt(i) == t.charAt(j)) {
          sm(i) = true; tm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < ls) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / ls + md / lt + (md - trans / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val maxL = math.min(4, math.min(ls, lt))
      var l = 0
      while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}

/** `graft_jaro_winkler(a, b)` → double in [0,1]; null if either side
  * is null. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires string inputs, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jw(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerKernel.jw($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
