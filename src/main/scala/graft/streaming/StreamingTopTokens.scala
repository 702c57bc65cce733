package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live heavy hitters — "what phrases dominate the crawl RIGHT NOW":
  * top-k tokens per event-time window, as ONE watermarked windowed
  * aggregation over the SpaceSaving sketch
  * ([[graft.functions.FreqSketch.heavyHitters]], a mergeable
  * `TypedImperativeAggregate`). The naive two-level form —
  * count-per-(window, term) then rank — is a CHAINED streaming
  * aggregation (restricted, and the first level's state is
  * vocabulary-sized per window); the sketch collapses it to one
  * aggregation whose per-window state is O(capacity) regardless of
  * traffic, with map-side partials merging upstream of the exchange —
  * the same reason the batch tier uses it.
  *
  * Accuracy contract (inherited from the sketch): any token whose
  * in-window frequency exceeds tokens/capacity is guaranteed present;
  * counts are exact while the window's distinct tokens ≤ capacity and
  * upper-bounded estimates beyond. Late rows beyond the watermark drop
  * (standard windowed-agg contract). Runs unchanged on a batch frame
  * (the parity spec's lever).
  */
object StreamingTopTokens {

  /** Top-`k` whitespace tokens per (keys, tumbling window). Output:
    * keys…, window_start, token, cnt — ranked rows flattened via
    * `inline`, cnt descending then token ascending (ties broken for
    * replay-stable output). */
  def topTokensStream(events: DataFrame, keys: Seq[String], tsCol: String,
      textCol: String, windowSec: Long, latenessSec: Long, k: Int,
      capacity: Int = 0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val isStream = events.isStreaming
    val base0 = events.withColumn("__ts", col(tsCol).cast("timestamp"))
    val base = if (isStream)
      base0.withWatermark("__ts", s"$latenessSec seconds")
    else base0
    base
      .select(keys.map(col) :+ col("__ts") :+
        explode(split(col(textCol), "\\s+")).as("__tok"): _*)
      .filter(length(col("__tok")) > 0)
      .groupBy(keys.map(col) :+ window(col("__ts"), s"$windowSec seconds"): _*)
      .agg(graft.functions.FreqSketch.heavyHitters(
        col("__tok"), k, capacity).as("__hh"))
      .select(keys.map(col) :+ col("window.start").as("window_start") :+
        explode(col("__hh")).as("__e"): _*)
      .select(keys.map(col) :+ col("window_start") :+
        col("__e.item").as("token") :+ col("__e.count").as("cnt"): _*)
  }
}
