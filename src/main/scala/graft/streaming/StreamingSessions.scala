package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization — the continuous counterpart of
  * [[graft.operators.Temporal.sessionize]]: a key's session closes when
  * no event arrives within `gapSec` of its last one, and the closed
  * session (start, end, count, sum) is emitted exactly once.
  *
  * This is the one custom-state shape the windowed-aggregation API cannot
  * express (session bounds depend on the DATA, not a fixed grid), so it
  * uses `flatMapGroupsWithState` with an EVENT-TIME timeout:
  *
  *  - rows hash-partition by key (one shuffle); each key holds one
  *    open-session state row — state size is O(active keys), independent
  *    of history, and eviction is driven by the watermark, not wall
  *    clock, so replays/backfills produce identical sessions
  *    (processing-time timeouts would not);
  *  - sessions that close INSIDE a batch (a later event arrives more
  *    than `gapSec` after the previous one) are emitted immediately;
  *    the trailing open session is emitted when the watermark passes
  *    `end + gapSec` (its timeout), i.e. once no in-horizon event can
  *    extend it;
  *  - events later than the watermark horizon (`latenessSec`) may be
  *    dropped by the engine upstream — the standard watermark contract,
  *    matching [[StreamingDedup]].
  */
object StreamingSessions {

  /** One closed session. Times are epoch seconds. */
  case class ClosedSession(key: String, start_s: Long, end_s: Long,
      n_events: Long, sum_v: Double)

  // the watermarked TimestampType column must survive into the typed
  // Dataset (Spark drops the event-time tag if it is projected away
  // before the stateful operator), so Ev carries the raw timestamp.
  // Both classes are public: Catalyst's generated encoder projections
  // cannot touch private members.
  case class Ev(key: String, ts: java.sql.Timestamp, v: Double) {
    def sec: Long = ts.getTime / 1000L
  }
  case class Open(start: Long, end: Long, n: Long, sum: Double)

  /** Sessionize a streaming frame.
    *
    * @param events streaming DataFrame with an event-time column
    * @param keyCol session key column (cast to string)
    * @param tsCol  event-time TimestampType column name
    * @param valueCol numeric column summed per session
    * @param gapSec session gap: a quiet period this long closes the session
    * @param latenessSec watermark delay for late events
    */
  def sessionStream(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gapSec: Long,
      latenessSec: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val typed = events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("ts", s"$latenessSec seconds")
      .as[Ev]
    typed.groupByKey(_.key)
      .flatMapGroupsWithState[Open, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Ev], state: GroupState[Open]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed end + gap: no in-horizon event can extend it
            val s = state.get
            state.remove()
            Iterator(ClosedSession(key, s.start, s.end, s.n, s.sum))
          } else {
            val batch = rows.toArray.sortBy(_.sec)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            batch.foreach { e =>
              open match {
                case Some(s) if e.sec - s.end <= gapSec =>
                  open = Some(Open(s.start, math.max(s.end, e.sec),
                    s.n + 1, s.sum + e.v))
                case Some(s) => // in-batch gap: close and start fresh
                  closed += ClosedSession(key, s.start, s.end, s.n, s.sum)
                  open = Some(Open(e.sec, e.sec, 1, e.v))
                case None =>
                  open = Some(Open(e.sec, e.sec, 1, e.v))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end + gapSec) * 1000L + 999L)
            }
            closed.result().iterator
          }
      }
  }
}
