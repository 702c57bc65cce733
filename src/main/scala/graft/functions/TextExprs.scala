package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling.
  *
  * [[graft.operators.Dedup.wordShingles]]' composable form (n shifted
  * `slice`s zipped with `zip_with` concat) is already the fast
  * *composable* plan, but every zip_with lambda evaluates outside
  * whole-stage codegen — per shingle: n−1 lambda binds, boxed
  * UTF8Strings, and intermediate arrays. Shingling is the single
  * hottest kernel in the text-dedup family (Jaccard runs it three
  * times, MinHash/LSH/contamination once each), so like
  * [[DotProduct]] it gets a native expression: one pass over the
  * token array building each shingle with a byte-append, evaluated
  * through a single JIT-friendly kernel in both interpreted and
  * codegen paths.
  *
  * Exact semantics of the composed form it replaces: tokens =
  * `split(text, " ")` (trailing empties kept), texts with fewer than
  * `n` tokens yield an empty array, shingle i = tokens[i..i+n−1]
  * joined by one space.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** One-pass kernel, shared by eval and codegen. */
  def shingle(text: UTF8String, n: Int): ArrayData = {
    // split on the single-space regex exactly as functions.split does
    // (limit -1: trailing empty tokens kept)
    val toks = text.split(UTF8String.fromString(" "), -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < out.length) {
      var s = toks(i)
      var j = 1
      while (j < n) { s = UTF8String.concat(s, space, toks(i + j)); j += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
