package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming two-sided CUSUM — the continuous counterpart of
  * [[graft.operators.Temporal.cusum]]: hourly/bucketed means close as
  * the watermark passes their end, and each closed bucket advances the
  * per-key drift state
  *   up = max(0, up + (v − target − k)), dn = max(0, dn + (target − v − k))
  * emitting one row per bucket with the alarm flag. The state machine
  * a live "this metric has drifted" monitor needs, not a per-point
  * outlier flag.
  *
  * Why custom state and not `groupBy(window(...))`: the CUSUM value of
  * a bucket depends on EVERY previous bucket of its key — a sequential
  * cross-window recurrence the windowed-agg API cannot express. So the
  * group key is the series key alone; state holds
  *  - the (sum, count) of every still-open bucket (bounded by the
  *    watermark horizon / bucket width, independent of history), and
  *  - the carried (up, dn) fold state — O(1);
  * on every trigger, buckets whose end ≤ watermark close IN BUCKET
  * ORDER and advance the fold — replay/backfill deterministic because
  * the watermark only moves forward.
  *
  * Late-data contract (same as [[StreamingTwa]]): a sample whose bucket
  * end is already behind the watermark is dropped — folding it would
  * mean rewriting already-emitted CUSUM history.
  *
  * Batch parity: identical recurrence and identical bucket means up to
  * summation order (the stream accumulates doubles per partition as
  * rows arrive; the batch side's exact-decimal mean differs by ≤1e-9 —
  * the parity spec's tolerance, like the TWA/sessions families).
  */
object StreamingCusum {

  case class CusumRow(key: String, bucket: Long, v: Double,
      cusumUp: Double, cusumDn: Double, alarm: Boolean)

  // public: Catalyst's encoder projections cannot touch private members
  case class Sample(key: String, ts: java.sql.Timestamp, v: Double) {
    def sec: Long = ts.getTime / 1000L
  }
  case class St(open: Map[Long, (Double, Long)], up: Double, dn: Double)

  /** @param events streaming DataFrame with an event-time column
    * @param bucketSec tumbling bucket width in seconds
    * @param latenessSec watermark delay for late events
    * @param target CUSUM reference level (the in-control mean)
    * @param k slack per step, `h` decision interval */
  def cusumStream(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSec: Long, latenessSec: Long,
      target: Double, k: Double, h: Double): Dataset[CusumRow] = {
    import events.sparkSession.implicits._
    val typed = events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("ts", s"$latenessSec seconds")
      .as[Sample]
    typed.groupByKey(_.key)
      .flatMapGroupsWithState[St, CusumRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Sample], state: GroupState[St]) =>
          val st = state.getOption.getOrElse(St(Map.empty, 0.0, 0.0))
          val wm = state.getCurrentWatermarkMs()
          var open = st.open
          rows.foreach { s =>
            val b = s.sec - math.floorMod(s.sec, bucketSec)
            // bucket already behind the watermark: folding it would
            // rewrite emitted CUSUM history — drop (TWA's contract)
            if ((b + bucketSec) * 1000L > wm) {
              val (sum, n) = open.getOrElse(b, (0.0, 0L))
              open = open.updated(b, (sum + s.v, n + 1))
            }
          }
          val (closable, stillOpen) =
            open.partition { case (b, _) => (b + bucketSec) * 1000L <= wm }
          var up = st.up
          var dn = st.dn
          val out = closable.toSeq.sortBy(_._1).map { case (b, (sum, n)) =>
            val v = sum / n
            up = math.max(0.0, up + (v - target - k))
            dn = math.max(0.0, dn + (target - v - k))
            CusumRow(key, b, v, up, dn, up > h || dn > h)
          }
          state.update(St(stillOpen, up, dn))
          if (stillOpen.nonEmpty)
            state.setTimeoutTimestamp(
              (stillOpen.keys.min + bucketSec) * 1000L)
          out.iterator
      }
  }
}
