package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-tier corpus statistics — the approximate, MERGEABLE summaries
  * a 100 TB corpus is actually profiled with. Exact counterparts exist
  * elsewhere in the suite (exact distinct = groupBy, exact heavy
  * hitters = [[TextAnalysis.topNgrams]]); these trade bounded error for
  * one-pass, fixed-memory, partition-mergeable execution — the property
  * that matters when the corpus doesn't fit a shuffle. All are Spark
  * built-ins (HLL++ / CountMinSketch), wrapped so the pipeline surface
  * names the intent.
  *
  * No DuckDB oracle (different engines' sketches legitimately disagree);
  * correctness is unit-tested as error bounds against exact answers.
  */
object CorpusStats {

  /** Approximate distinct count of a column (HyperLogLog++, mergeable
    * partials; `rsd` = target relative standard deviation). */
  def approxDistinct(df: DataFrame, c: Column, rsd: Double = 0.02): Long =
    df.agg(approx_count_distinct(c, rsd)).head().getLong(0)

  /** Approximate per-doc-distinct shingle vocabulary of a text corpus:
    * one narrow explode, one HLL aggregation — no vocabulary shuffle. */
  def approxShingleVocab(df: DataFrame, textCol: String, n: Int = 3,
      rsd: Double = 0.02): Long =
    approxDistinct(
      df.select(explode(array_distinct(
        Dedup.wordShingles(col(textCol), n))).as("sh")),
      col("sh"), rsd)

  /** Per-stratum approximate distinct counts in ONE pass (the profile
    * table a mixture sampler reads): `(strataCol, approx_docs,
    * approx_vocab)`. `explode_outer` keeps docs with zero shingles
    * (< 3 tokens) so `approx_docs` counts every doc, not just docs
    * with at least one shingle. */
  def strataProfile(df: DataFrame, strataCol: String, idCol: String,
      textCol: String, rsd: Double = 0.05): DataFrame =
    df.select(col(strataCol), col(idCol),
        explode_outer(array_distinct(Dedup.wordShingles(col(textCol), 3)))
          .as("sh"))
      .groupBy(strataCol)
      .agg(approx_count_distinct(col(idCol), rsd).as("approx_docs"),
        approx_count_distinct(col("sh"), rsd).as("approx_vocab"))

  /** Approximate top-k frequent tokens over the whole corpus via the
    * native SpaceSaving aggregate ([[graft.functions.HeavyHittersAgg]]):
    * one narrow explode, one capacity-bounded mergeable aggregation —
    * the shuffle carries O(capacity) counters per task, never the
    * vocabulary (the exact tier, [[TextAnalysis.topNgrams]], shuffles
    * O(distinct)). Output: `(item, count, err)` rows, count desc; the
    * true count lies in `[count − err, count]`, and anything with
    * frequency > tokens/capacity is guaranteed present. */
  def approxTopTokens(df: DataFrame, textCol: String, k: Int,
      capacity: Int = 4096): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .agg(graft.functions.FreqSketch.heavyHitters(col("tok"), k, capacity)
        .as("hh"))
      .selectExpr("inline(hh)")
}
