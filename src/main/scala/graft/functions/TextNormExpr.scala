package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Unicode text normalization — the canonical first step of a
  * corpus-cleaning pipeline (the CCNet/C4-style "fix the bytes before
  * you measure anything" move; every downstream operator — shingles,
  * signatures, token counts, dedup keys — keys off these exact bytes,
  * so two visually identical documents with different combining-char
  * encodings MUST normalize to one form before any of them run).
  *
  * Semantics, in order (each step engine-independent and mirrored by
  * the DuckDB oracle expression in q_normalize):
  *   1. Unicode NFC (canonical composition — `e` + U+0301 → `é`);
  *   2. U+00A0 (NBSP) treated as a space;
  *   3. control characters U+0000–U+0008, U+000E–U+001F, U+007F
  *      dropped (the C0 set minus the five ASCII whitespace controls
  *      `\t \n \x0B \x0C \r`, which step 4 owns);
  *   4. runs of ASCII whitespace `[\x09-\x0D ]` collapsed to one
  *      space, leading/trailing whitespace trimmed.
  *
  * NFC (not NFKC) deliberately: canonical equivalence is lossless,
  * while compatibility folding (ligatures, super/subscripts) changes
  * text content — a corpus-policy decision, not a default.
  *
  * This is a PURE PER-ROW function — scan → project, zero exchanges —
  * so at 100 TB it rides the ingest scan for free (same argument as
  * [[SignatureKernels]]). Steps 2–4 fuse into a single builder pass;
  * NFC first runs [[Normalizer.isNormalized]], so the common
  * already-NFC document pays one scan, not a recomposition.
  */
object TextNormKernel {

  def normalize(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfc =
      if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = nfc.charAt(i)
      val isWs = c == ' ' || (c >= '\t' && c <= '\r') || c == '\u00A0'
      if (isWs) {
        if (sb.length > 0) pendingSpace = true // leading ws never emits
      } else if (c >= ' ' && c != '\u007F') {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      } // else: non-ws control — dropped, pendingSpace unchanged
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing ws left pending = trim
  }
}

/** `graft_normalize(text)` → NFC + control-strip + whitespace-collapsed
  * string; null in, null out. */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNormKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormKernel.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def apply(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))
}
