package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution drift — the continuous counterpart of
  * [[graft.operators.Drift.psi]]: each event-time window's value
  * histogram is compared (as PSI, add-one smoothed) against a FIXED
  * reference distribution captured from the training/baseline corpus.
  * The "is live traffic still shaped like what we trained on" monitor.
  *
  * Unlike CUSUM there is no cross-window recurrence — a window's PSI
  * depends only on that window's rows — so this compiles to ONE
  * watermarked windowed aggregation in append mode: the per-bin counts
  * are `bins` conditional sums (bins are FIXED at plan time, so the
  * histogram is a row of columns, not a second grouping), and the PSI
  * fold over them is a row-level expression. No custom state, no
  * mapGroupsWithState — the cheapest structure that expresses it, and
  * partial aggregation absorbs the per-partition counting upstream of
  * the one keyed exchange.
  *
  * Late rows beyond the watermark are dropped by the engine (standard
  * windowed-agg contract); bin edges ride in as literals, so the only
  * shuffle is the (keys, window) aggregation itself.
  */
object StreamingDrift {

  /** PSI per (keys, event-time tumbling window) against `refFracs` —
    * the reference bin fractions from
    * [[graft.operators.Drift.binFractions]] (same [lo, hi] and `bins`,
    * or the comparison is meaningless; that contract is the caller's).
    * Output: keys…, window_start (timestamp), n (rows in window),
    * psi (double).
    *
    * Works unchanged on a batch DataFrame (the parity spec runs the
    * same plan both ways — windowed aggs are batch-executable). */
  def psiStream(events: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, windowSec: Long, latenessSec: Long,
      lo: Double, hi: Double, bins: Int,
      refFracs: Seq[Double]): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    require(refFracs.length == bins,
      s"refFracs must have $bins entries (got ${refFracs.length})")
    require(refFracs.forall(_ > 0.0),
      "refFracs must be strictly positive (use smoothed fractions)")
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol).cast("double") - lit(lo)) * bins /
        lit(hi - lo + 1.0)).cast("int")))
    val isStream = events.isStreaming
    val withBin0 = events
      .withColumn("__b", bin)
      .withColumn("__ts", col(tsCol).cast("timestamp"))
    val withBin = if (isStream)
      withBin0.withWatermark("__ts", s"$latenessSec seconds")
    else withBin0
    val counts = (0 until bins).map(i =>
      sum(when(col("__b") === i, 1L).otherwise(0L)).as(s"__c$i"))
    val agged = withBin
      .groupBy(keys.map(col) :+ window(col("__ts"), s"$windowSec seconds"): _*)
      .agg(counts.head, counts.tail: _*)
    val n: Column = (0 until bins).map(i => col(s"__c$i")).reduce(_ + _)
    val psi: Column = (0 until bins).map { i =>
      val a = (col(s"__c$i") + 1).cast("double") /
        (n + bins).cast("double")
      val e = lit(refFracs(i))
      (a - e) * log(a / e)
    }.reduce(_ + _)
    agged.select(keys.map(col) :+
      col("window.start").as("window_start") :+
      n.as("n") :+ psi.as("psi"): _*)
  }
}
