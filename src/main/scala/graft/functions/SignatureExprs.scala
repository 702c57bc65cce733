package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass document-signature kernels.
  *
  * The insight that motivates these: a MinHash signature and a SimHash
  * are PURE PER-ROW functions of the text — `sig_i = min over shingles
  * of h_i(shingle)` needs no grouping because min over the shingle
  * multiset ≡ min over the set, and SimHash's per-bit votes are a plain
  * fold over the token list. The previous plans (explode(shingles) →
  * groupBy(doc).agg(min…), explode(tokens) → groupBy(doc).agg(60 sums))
  * paid a full O(docs·shingles)-row exchange for what is actually a
  * narrow map: at 100 TB the explode+groupBy shape shuffles ~terabytes
  * of (id, shingle) rows that never needed to leave their input
  * partition. With these expressions the whole signature family
  * (MinHash, LSH banding, SimHash, signature-estimated Jaccard) is
  * embarrassingly parallel — scan → project, zero exchanges — and the
  * only remaining shuffles in the dedup pipelines are the genuinely
  * cross-doc candidate joins.
  *
  * Hash semantics are EXACTLY the engine-independent 60-bit md5 scheme
  * of [[graft.operators.Dedup.hash60]] (`conv(substr(md5(s),1,15),16,10)`:
  * the first 15 hex chars of an md5 are the big-endian long of the first
  * 8 digest bytes, logically shifted right 4 bits), so every DuckDB
  * oracle and every previously persisted signature stays bit-identical.
  */
object SignatureKernels {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** 60-bit md5 prefix hash of `prefix ++ bytes` — first 15 hex chars of
    * the digest as an unsigned long (always ≥ 0, < 2^60). */
  def hash60(md: MessageDigest, prefix: Array[Byte], bytes: Array[Byte]): Long = {
    md.reset()
    if (prefix.length > 0) md.update(prefix)
    md.update(bytes)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private val emptyPrefix = Array.empty[Byte]

  /** All `h` MinHash signature values of `text` in one pass over its word
    * `n`-gram shingles: sigs(i) = min over shingles of
    * hash60("i:" ++ shingle). Returns null when the text has no shingles
    * (fewer than `n` tokens) — the signature is undefined there, matching
    * the explode→groupBy form that simply never emitted such docs. */
  def minhash(text: UTF8String, n: Int, h: Int): ArrayData = {
    val sh = WordShingles.shingle(text, n)
    val m = sh.numElements()
    if (m == 0) return null
    val md = md5Local.get()
    val prefixes = MinHashSigs.prefixes(h)
    val mins = new Array[Long](h)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      val bytes = sh.getUTF8String(i).getBytes
      var k = 0
      while (k < h) {
        val v = hash60(md, prefixes(k), bytes)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 60-bit SimHash of the whitespace tokens of `text` (with
    * multiplicity): bit b is set iff Σ_tokens (±1 by bit b of
    * hash60(token)) is positive. `split(text, " ", -1)` semantics —
    * empty text contributes one empty token, like the exploded form. */
  def simhash(text: UTF8String): Long = {
    val toks = text.split(UTF8String.fromString(" "), -1)
    val md = md5Local.get()
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val v = hash60(md, emptyPrefix, toks(i).getBytes)
      var b = 0
      while (b < 60) {
        votes(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** `minhash(text, n, h)` → array<long> of the `h` signature mins over
  * word `n`-gram shingles; null when the text has fewer than `n` tokens. */
case class MinHashSigs(child: Expression, n: Int, h: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")
  require(h >= 1 && h <= 1024, "signature length must be in [1, 1024]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null on shingle-less (< n tokens) input even when the child is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.minhash(input.asInstanceOf[UTF8String], n, h)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.SignatureKernels.minhash($c, $n, $h);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  // per-hash-function md5 prefixes "0:", "1:", … — tiny, cached per h
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  def prefixes(h: Int): Array[Array[Byte]] =
    cache.computeIfAbsent(h, k => Array.tabulate(k)(i => s"$i:".getBytes("UTF-8")))

  def apply(text: Column, n: Int, h: Int): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(text), n, h))
}

/** `simhash(text)` → 60-bit SimHash long over whitespace tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SignatureKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
