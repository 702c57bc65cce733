package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming time-weighted average — the continuous counterpart of
  * [[graft.operators.Temporal.timeWeightedAvg]]: each (key, bucket) emits
  * exactly one finalized row once the watermark passes the bucket end,
  * with every sample weighted by its hold time to the next sample (the
  * last holds to bucket end; the head gap is excluded, exactly the batch
  * semantics).
  *
  * Why custom state and not `groupBy(window(...))`: the hold weights
  * depend on NEIGHBORING samples (a lead over event time), which the
  * windowed-aggregation API cannot express incrementally — a late
  * in-horizon sample landing BETWEEN two earlier ones changes both their
  * holds. So the bucket's samples buffer in keyed state until the
  * watermark closes the bucket, then one sort computes the holds:
  *
  *  - rows hash-partition by (key, bucket) — the same keying as the
  *    batch operator's one shuffle;
  *  - state is O(samples in open buckets) per key, bounded by bucket
  *    population and the watermark horizon, independent of history;
  *  - the event-time timeout at bucket end fires once the watermark
  *    (which already lags real event time by `latenessSec`) passes it,
  *    so every in-horizon sample has arrived — replays and backfills
  *    produce identical buckets;
  *  - a sample arriving after its bucket was finalized (later than the
  *    watermark horizon) is DROPPED, never double-emitted — the guard
  *    compares the bucket end against the current watermark, matching
  *    the standard late-data contract of [[StreamingDedup]].
  */
object StreamingTwa {

  /** One finalized bucket. `covered` = seconds actually attributed. */
  case class TwaBucket(key: String, bucket: Long, twa: Double,
      covered: Long, n: Long)

  // public: Catalyst's encoder projections cannot touch private members
  case class Sample(key: String, ts: java.sql.Timestamp, v: Double) {
    def sec: Long = ts.getTime / 1000L
  }
  case class Buf(samples: Vector[(Long, Double)])

  /** @param events streaming DataFrame with an event-time column
    * @param keyCol grouping key column (cast to string)
    * @param tsCol  event-time TimestampType column name
    * @param valueCol numeric column to average
    * @param bucketSec tumbling bucket width in seconds
    * @param latenessSec watermark delay for late events
    */
  def twaStream(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSec: Long,
      latenessSec: Long): Dataset[TwaBucket] = {
    import events.sparkSession.implicits._
    val typed = events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("ts", s"$latenessSec seconds")
      .as[Sample]
    typed.groupByKey(s => (s.key, s.sec - math.floorMod(s.sec, bucketSec)))
      .flatMapGroupsWithState[Buf, TwaBucket](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (kb: (String, Long), rows: Iterator[Sample], state: GroupState[Buf]) =>
          val (key, bucket) = kb
          val bucketEndMs = (bucket + bucketSec) * 1000L
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed bucket end: every in-horizon sample is in
            val samples = state.get.samples.sorted
            state.remove()
            Iterator(finalizeBucket(key, bucket, bucketSec, samples))
          } else if (state.getOption.isEmpty &&
              state.getCurrentWatermarkMs() >= bucketEndMs) {
            // sample later than the horizon for an already-finalized
            // bucket: drop it — emitting again would duplicate the bucket
            Iterator.empty
          } else {
            val prev = state.getOption.map(_.samples).getOrElse(Vector.empty)
            val buf = Buf(prev ++ rows.map(s => (s.sec, s.v)))
            state.update(buf)
            state.setTimeoutTimestamp(bucketEndMs)
            Iterator.empty
          }
      }
  }

  private def finalizeBucket(key: String, bucket: Long, bucketSec: Long,
      sorted: Vector[(Long, Double)]): TwaBucket = {
    var wsum = 0.0
    var covered = 0L
    var i = 0
    while (i < sorted.length) {
      val (sec, v) = sorted(i)
      val next = if (i + 1 < sorted.length) sorted(i + 1)._1
        else bucket + bucketSec
      val hold = next - sec
      wsum += v * hold
      covered += hold
      i += 1
    }
    TwaBucket(key, bucket, wsum / covered, covered, sorted.length)
  }
}
