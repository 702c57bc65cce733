package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{StreamingDedup, StreamingDrift, StreamingTopTokens,
  StreamRun}

/** Driver-gated rows for the Structured Streaming tier. Until now the
  * streaming operators were unit-gated only (MemoryStream parity ≤1e-9
  * in the specs); these run the REAL streaming path — file source →
  * watermarked stateful operator → sink, via [[StreamRun]]'s
  * AvailableNow replay — and land in the same DuckDB differential gate
  * as every batch operator.
  *
  * Determinism (the reason these two and not, say, append-mode
  * windowed aggs whose final windows hang on a timeout batch):
  *  - q_stream_dedup: the dedup horizon (100 years) exceeds the data's
  *    event-time span, so no fingerprint is ever evicted and the kept
  *    set is exactly one row per distinct text under ANY micro-batch
  *    split; the projection keeps only duplicate-invariant columns
  *    (md5(text), length(text)) so WHICH copy survived is invisible.
  *  - q_stream_tokens: Complete-mode windowed aggregation — the sink's
  *    final table is the aggregate over all input regardless of batch
  *    boundaries, and capacity (4096) ≥ the corpus vocabulary, where
  *    SpaceSaving is exact (err = 0), so counts equal plain
  *    count(*) and the (cnt desc, token asc) top-k is total-ordered.
  *
  * Event time is synthesized from doc_id (the corpus has no timestamp
  * column): epoch second = doc_id + 10⁶, so a 1000-second window is a
  * 1000-document ingest slice. The 10⁶ s shift keeps every event time
  * strictly above the stream's INITIAL watermark (epoch 0) — a ts==0
  * row sits exactly on the late boundary and
  * dropDuplicatesWithinWatermark drops it (measured: doc_id 0 vanished
  * from the kept set; StreamRunSpec would catch a regression).
  */
object StreamingQueries {

  private val TsShift = 1000000L

  private def docsPath(dir: String) = s"$dir/documents.parquet"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── streaming ingest dedup: dropDuplicatesWithinWatermark over the
    //    md5 fingerprint, horizon >> data span (state bounded by the
    //    horizon in production; global-distinct here so the replay is
    //    batch-split-invariant). Output: one row per distinct text.
    "q_stream_dedup" -> ((s, dir) => {
      StreamRun.toTable(s, docsPath(dir), src =>
          StreamingDedup.dedupStream(
              src.withColumn("__ts",
                timestamp_seconds(col("doc_id") + lit(TsShift))),
              "__ts", latenessSec = 3155760000L)
            .select(md5(col("text")).as("fp"),
              length(col("text")).cast("long").as("n_chars")),
          OutputMode.Append())
        .orderBy("fp")
    }),

    // ── live heavy hitters: top-5 tokens per 1000-doc event-time
    //    window through the mergeable SpaceSaving aggregate, Complete
    //    mode (final table = full-input aggregate).
    "q_stream_tokens" -> ((s, dir) => {
      StreamRun.toTable(s, docsPath(dir), src =>
          StreamingTopTokens.topTokensStream(
            src.withColumn("__ts",
              timestamp_seconds(col("doc_id") + lit(TsShift))),
            Seq.empty, "__ts", "text", windowSec = 1000L,
            latenessSec = 3155760000L, k = 5, capacity = 4096),
          OutputMode.Complete())
        // windows are epoch-aligned and TsShift is window-divisible, so
        // subtracting it lands buckets back on doc_id // 1000 * 1000
        .select((col("window_start").cast("long") - lit(TsShift))
          .as("bucket"), col("token"), col("cnt"))
        .orderBy("bucket", "token")
    }),

    // ── streaming distribution drift: per-(type, day) PSI of the live
    //    value histogram against the corpus baseline (binFractions),
    //    Complete mode — the "is live traffic still shaped like what
    //    we trained on" monitor over the real events stream. Baseline
    //    lo/hi/fractions come from one batch pre-pass (a real monitor
    //    freezes them from the training corpus the same way).
    "q_stream_psi" -> ((s, dir) => {
      val ev = graft.sources.Tables.load(s, dir, "events")
      val mm = ev.agg(min(col("value").cast("double")),
        max(col("value").cast("double"))).head()
      val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
      val ref = graft.operators.Drift.binFractions(ev, "value", lo, hi,
        bins = 10)
      StreamRun.toTable(s, s"$dir/events.parquet", src => {
          // the raw stream bypasses Tables.load's dual-layout absorber:
          // normalize here with Tables.load's OWN conversions — exact
          // integer `ts div 1000` (double division of epoch nanos loses
          // ~256 ns past 2^53 and ROUNDS, so a boundary row could land
          // in the next window on the stream side only)
          val ts = src.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              expr("timestamp_micros(ts div 1000)")
            case _ => col("ts").cast("timestamp")
          }
          StreamingDrift.psiStream(src.withColumn("__t", ts),
            Seq("event_type"), "__t", "value", windowSec = 86400L,
            latenessSec = 3155760000L, lo = lo, hi = hi, bins = 10,
            refFracs = ref)
        }, OutputMode.Complete())
        .select(col("event_type"),
          col("window_start").cast("long").as("bucket"), col("n"),
          (round(col("psi") + lit(1e-9), 6) + lit(0.0)).as("psi"))
        .orderBy("event_type", "bucket")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // one row per distinct text: fp is the dedup key, n_chars is
    // constant within a fp group (same bytes), so min() = the value
    "q_stream_dedup" ->
      """SELECT md5(text) AS fp,
        |       CAST(min(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    // exact replay of the windowed top-5: tumbling 1000-second windows
    // over epoch-second doc_id, count per token, (cnt desc, token asc)
    // rank — the sketch is exact at this vocabulary (≤ capacity)
    "q_stream_tokens" ->
      """WITH toks AS (
        |  SELECT CAST(doc_id // 1000 * 1000 AS BIGINT) AS bucket,
        |         unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents
        |), cnt AS (
        |  SELECT bucket, token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks WHERE length(token) > 0 GROUP BY 1, 2
        |), rk AS (
        |  SELECT bucket, token, cnt,
        |         row_number() OVER (PARTITION BY bucket
        |           ORDER BY cnt DESC, token) AS r
        |  FROM cnt
        |)
        |SELECT bucket, token, cnt FROM rk WHERE r <= 5
        |ORDER BY bucket, token""".stripMargin,

    // windowed PSI replay: baseline bin fractions = smoothed corpus
    // histogram ((c+1)/(n+bins), binFractions' formula); per-(type,
    // day) smoothed window fractions against them; terms decimal-routed
    // like q_psi so summation order can't move the 6-decimal rounding
    "q_stream_psi" ->
      """WITH mm AS (
        |  SELECT CAST(min(value) AS DOUBLE) AS lo,
        |         CAST(max(value) AS DOUBLE) AS hi FROM events
        |), b AS (
        |  SELECT event_type,
        |         CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 AS bucket,
        |         least(9, greatest(0, CAST(floor(
        |           (CAST(value AS DOUBLE) - mm.lo) * 10 /
        |           (mm.hi - mm.lo + 1.0)) AS INT))) AS bb
        |  FROM events CROSS JOIN mm
        |), refc AS (SELECT bb, count(*) AS c FROM b GROUP BY 1),
        |nall AS (SELECT count(*) AS nn FROM b),
        |spine AS (SELECT unnest(range(0, 10)) AS bb),
        |ref AS (
        |  SELECT sp.bb,
        |         CAST(coalesce(rc.c, 0) + 1 AS DOUBLE) /
        |         CAST(nall.nn + 10 AS DOUBLE) AS e
        |  FROM spine sp LEFT JOIN refc rc USING (bb) CROSS JOIN nall
        |), wb AS (
        |  SELECT event_type, bucket, bb, count(*) AS cc
        |  FROM b GROUP BY 1, 2, 3
        |), wn AS (
        |  SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2
        |), grid AS (
        |  SELECT wn.event_type, wn.bucket, wn.n, r.bb, r.e,
        |         coalesce(wb.cc, 0) AS cc
        |  FROM wn CROSS JOIN ref r
        |  LEFT JOIN wb ON wb.event_type = wn.event_type
        |    AND wb.bucket = wn.bucket AND wb.bb = r.bb
        |)
        |SELECT event_type, bucket, CAST(n AS BIGINT) AS n,
        |  round(CAST(sum(CAST(
        |    (CAST(cc + 1 AS DOUBLE) / CAST(n + 10 AS DOUBLE) - e) *
        |    ln((CAST(cc + 1 AS DOUBLE) / CAST(n + 10 AS DOUBLE)) / e)
        |  AS DECIMAL(30,12))) AS DOUBLE) + 1e-9, 6) + 0.0 AS psi
        |FROM grid GROUP BY 1, 2, n ORDER BY 1, 2""".stripMargin,
  )
}
