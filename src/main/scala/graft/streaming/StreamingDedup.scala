package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming ingest dedup for document corpora: the first-seen copy of
  * each fingerprint flows through, duplicates arriving within the
  * allowed lateness are dropped — the streaming front-door to the batch
  * dedup family ([[graft.operators.Dedup]]).
  *
  * State discipline (the 100 TB concern): a plain streaming
  * `dropDuplicates(fp)` keeps EVERY fingerprint ever seen in the state
  * store — unbounded growth on a continuous crawl. This uses
  * `dropDuplicatesWithinWatermark`, which evicts a fingerprint once the
  * watermark passes its last occurrence + `latenessSec`: state is
  * bounded by the dedup horizon, not corpus history. The tradeoff —
  * a duplicate arriving later than the horizon passes through — is the
  * standard streaming-dedup contract; the batch LSH/exact passes
  * downstream are the full-history backstop.
  *
  * Fingerprint choices (all engine-independent, shared with batch):
  *  - [[Dedup.contentKey]] — exact bytes (md5);
  *  - [[TextAnalysis.fingerprint]] — canonical form (case/punct/
  *    whitespace-insensitive), catches trivially-edited mirrors;
  *  - [[simhashKey]] — 60-bit SimHash equality, near-identical docs.
  *
  * The dedup itself is a narrow stateful operator: rows hash-partition
  * by fingerprint (one shuffle of (fp, doc) pairs), state lookups are
  * per-key; no cross-partition coordination.
  */
object StreamingDedup {

  /** SimHash-equality key: near-identical token multisets collide. */
  def simhashKey(textCol: Column): Column =
    graft.functions.SimHash64(textCol)

  /** Drop duplicate documents from a streaming frame, keeping the
    * first-seen copy per fingerprint within the watermark horizon.
    *
    * @param docs        streaming DataFrame with an event-time column
    * @param tsCol       event-time (TimestampType) column name
    * @param latenessSec dedup horizon: duplicates within this many
    *                    seconds of the first copy are dropped; state is
    *                    evicted beyond it
    * @param key         fingerprint expression (default: exact md5 of
    *                    `text`)
    */
  def dedupStream(docs: DataFrame, tsCol: String, latenessSec: Long,
      key: Column = null): DataFrame = {
    val fp = Option(key).getOrElse(Dedup.contentKey(col("text")))
    docs
      .withColumn("__fp", fp)
      .withWatermark(tsCol, s"$latenessSec seconds")
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }
}
