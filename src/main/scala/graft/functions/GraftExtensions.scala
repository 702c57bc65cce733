package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension entry point registering graft's native expressions
  * with the SQL function registry, so SQL-surface users get them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  * // or: --conf spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * The DataFrame API path ([[VectorExprs.dot]]) does not require the
  * extension — it builds the expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {


  /** Non-deprecated 11-arg ExpressionInfo (the short forms are deprecated
    * since 3.0). */
  private def info(className: String, name: String, usage: String) =
    new ExpressionInfo(className, null, name, usage,
      "", "", "", "", "", "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct].getCanonicalName, "graft_dot",
        "graft_dot(a, b) - sequential-fold dot product of two array<double> " +
          "columns; null on null input, null element, or length mismatch."),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot takes exactly 2 arguments, got ${children.length}")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      info(classOf[SortedIntersectCount].getCanonicalName, "graft_sorted_intersect",
        "graft_sorted_intersect(a, b) - common-element count of two " +
          "sorted, distinct array<string> columns (two-pointer merge); " +
          "null on null input."),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_sorted_intersect takes exactly 2 arguments, got ${children.length}")
        SortedIntersectCount(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      info(classOf[WordShingles].getCanonicalName, "graft_word_shingles",
        "graft_word_shingles(text, n) - word n-gram shingles of a " +
          "whitespace-tokenized string; fewer than n tokens yields []."),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_word_shingles takes exactly 2 arguments, got ${children.length}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "graft_word_shingles: n must be an integer literal")
        }
        WordShingles(children(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info(classOf[MinHashSigs].getCanonicalName, "graft_minhash",
        "graft_minhash(text, n, h) - array<long> of h MinHash signature " +
          "mins over word n-gram shingles (60-bit md5 hashes); null when " +
          "the text has fewer than n tokens."),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_minhash takes exactly 3 arguments, got ${children.length}")
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"graft_minhash: $name must be an integer literal")
        }
        MinHashSigs(children(0), intLit(children(1), "n"), intLit(children(2), "h"))
      }))
    def intLitArg(e: Expression, fn: String, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(
        s"$fn: $name must be an integer literal")
    }
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info(classOf[TopKAgg].getCanonicalName, "graft_topk",
        "graft_topk(v, k) - aggregate: array<double> of the k largest " +
          "non-null values, descending; O(k) state per group."),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_topk takes exactly 2 arguments, got ${children.length}")
        TopKAgg(org.apache.spark.sql.catalyst.expressions.Cast(
          children(0), org.apache.spark.sql.types.DoubleType),
          intLitArg(children(1), "graft_topk", "k"), bottom = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bottomk"),
      info(classOf[TopKAgg].getCanonicalName, "graft_bottomk",
        "graft_bottomk(v, k) - aggregate: array<double> of the k smallest " +
          "non-null values, ascending; O(k) state per group."),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_bottomk takes exactly 2 arguments, got ${children.length}")
        TopKAgg(org.apache.spark.sql.catalyst.expressions.Cast(
          children(0), org.apache.spark.sql.types.DoubleType),
          intLitArg(children(1), "graft_bottomk", "k"), bottom = true)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      info(classOf[HeavyHittersAgg].getCanonicalName, "graft_heavy_hitters",
        "graft_heavy_hitters(v, k, capacity) - aggregate: SpaceSaving " +
          "top-k frequent strings as array<struct<item,count,err>>; true " +
          "count in [count-err, count], anything with frequency > " +
          "n/capacity guaranteed present."),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_heavy_hitters takes exactly 3 arguments, got ${children.length}")
        HeavyHittersAgg(org.apache.spark.sql.catalyst.expressions.Cast(
          children(0), org.apache.spark.sql.types.StringType),
          intLitArg(children(1), "graft_heavy_hitters", "k"),
          intLitArg(children(2), "graft_heavy_hitters", "capacity"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      info(classOf[NormalizeText].getCanonicalName, "graft_normalize",
        "graft_normalize(text) - Unicode NFC + NBSP-as-space + " +
          "control-char strip (C0 minus ASCII whitespace, DEL) + " +
          "whitespace collapse/trim, in one pass."),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_normalize takes exactly 1 argument, got ${children.length}")
        NormalizeText(children(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      info(classOf[JaroWinkler].getCanonicalName, "graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1] " +
          "(DuckDB-compatible: floored half-transpositions, 0.7 boost " +
          "threshold, empty -> 0)."),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_jaro_winkler takes exactly 2 arguments, got ${children.length}")
        JaroWinkler(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info(classOf[SimHash64].getCanonicalName, "graft_simhash",
        "graft_simhash(text) - 60-bit SimHash long over whitespace tokens " +
          "(60-bit md5 token hashes, ±1 votes per bit)."),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_simhash takes exactly 1 argument, got ${children.length}")
        SimHash64(children(0))
      }))
  }
}
