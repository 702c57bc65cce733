package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd set kernels over SORTED string arrays.
  *
  * The exact-Jaccard verify stage scores every candidate pair with
  * `size(array_intersect(set_a, set_b))`: Spark's `array_intersect`
  * builds a hash set of one side and a RESULT ARRAY of the common
  * elements per evaluation — two allocations plus hashing of every
  * string, only for `size` to throw the array away. The shingle sets
  * are already sorted (`sort_array(collect_list(...))`), so the count
  * is a TWO-POINTER MERGE: no hash set, no result array, one comparison
  * per step, inside whole-stage codegen. At near-dup-cluster density
  * (the verify join's payload is two ~doc-sized arrays per candidate
  * pair) the allocation savings dominate.
  *
  * Contract: both inputs must be sorted ascending with DISTINCT,
  * non-null elements (exactly what `sort_array(collect_list(x))` over
  * per-doc-distinct shingles produces) — then the result equals
  * `size(array_intersect(a, b))` (property-tested). Null input → null.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      // array<long> variant (r14): the PPJoin family hashes shingles to
      // 60-bit longs before any exchange — the merge runs on primitive
      // compares instead of UTF8String ones
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect requires array<string> or array<bigint> " +
          s"inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
    }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    if (isLong) {
      while (i < n && j < m) {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < n && j < m) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val step =
        if (isLong)
          s"""final long $xv = $a.getLong($i);
             |final long $yv = $b.getLong($j);
             |final int $cmp = $xv == $yv ? 0 : ($xv < $yv ? -1 : 1);""".stripMargin
        else
          s"final int $cmp = $a.getUTF8String($i)" +
            s".compareTo($b.getUTF8String($j));"
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  $step
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ArrayExprs {

  /** Common-element count of two sorted, distinct `array<string>`
    * columns — codegen'd two-pointer merge. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
