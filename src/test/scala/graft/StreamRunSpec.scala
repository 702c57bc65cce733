package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{StreamingDedup, StreamingTopTokens, StreamRun}

/** The determinism contract behind the streaming driver rows
  * ([[StreamingQueries]]): the final table must not depend on how the
  * file source slices the input into micro-batches. Forced here by
  * writing the corpus as 4 parquet files and streaming with
  * maxFilesPerTrigger=1 (4 batches + AvailableNow), compared against
  * the single-batch run AND the plain batch computation.
  */
class StreamRunSpec extends SparkSpec {

  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("streamrun-src").toString
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def dedupBuild(src: org.apache.spark.sql.DataFrame) =
    StreamingDedup.dedupStream(
        src.withColumn("__ts", timestamp_seconds(col("doc_id") + lit(1000000L))),
        "__ts", latenessSec = 3155760000L)
      .select(md5(col("text")).as("fp"),
        length(col("text")).cast("long").as("n_chars"))

  test("stream dedup: 4-batch split == 1-batch == batch distinct") {
    val one = StreamRun.toTable(spark, srcDir, dedupBuild, OutputMode.Append())
    val four = StreamRun.toTable(spark, srcDir, dedupBuild,
      OutputMode.Append(), Map("maxFilesPerTrigger" -> "1"))
    val batch = spark.read.parquet(srcDir)
      .select(md5(col("text")).as("fp"),
        length(col("text")).cast("long").as("n_chars"))
      .distinct()
    assert(one.count() == batch.count())
    assert(one.except(four).isEmpty && four.except(one).isEmpty)
    assert(one.except(batch).isEmpty && batch.except(one).isEmpty)
  }

  private def tokensBuild(src: org.apache.spark.sql.DataFrame) =
    StreamingTopTokens.topTokensStream(
      src.withColumn("__ts", timestamp_seconds(col("doc_id") + lit(1000000L))),
      Seq.empty, "__ts", "text", windowSec = 200L,
      latenessSec = 3155760000L, k = 5, capacity = 4096)

  test("stream top-tokens (Complete): 4-batch split == 1-batch == batch agg") {
    val one = StreamRun.toTable(spark, srcDir, tokensBuild,
      OutputMode.Complete())
    val four = StreamRun.toTable(spark, srcDir, tokensBuild,
      OutputMode.Complete(), Map("maxFilesPerTrigger" -> "1"))
    // batch replay: plain windowed count + (cnt desc, token asc) top-5 —
    // the sketch is exact at this vocabulary, so they must agree
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start").orderBy(col("cnt").desc, col("token"))
    val batch = spark.read.parquet(srcDir)
      .select(window(timestamp_seconds(col("doc_id") + lit(1000000L)), "200 seconds")
        .getField("start").as("window_start"),
        explode(split(col("text"), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("window_start", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= 5)
      .drop("__r")
    assert(one.count() > 0)
    assert(one.except(four).isEmpty && four.except(one).isEmpty)
    assert(one.except(batch).isEmpty && batch.except(one).isEmpty)
  }

  test("stream PSI (Complete): 4-batch split == 1-batch == batch psiStream") {
    val evDir = Files.createTempDirectory("streamrun-ev").toString
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_type", "ts", "value")
      .repartition(4)
      .write.mode("overwrite").parquet(evDir)
    val ref = Seq.fill(10)(0.1)
    def build(src: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamingDrift.psiStream(src, Seq("event_type"),
        "ts", "value", windowSec = 86400L, latenessSec = 3155760000L,
        lo = 0.0, hi = 200.0, bins = 10, refFracs = ref)
    val one = StreamRun.toTable(spark, evDir, build, OutputMode.Complete())
    val four = StreamRun.toTable(spark, evDir, build,
      OutputMode.Complete(), Map("maxFilesPerTrigger" -> "1"))
    // psiStream runs unchanged on a batch frame — the parity lever
    val batch = build(spark.read.parquet(evDir))
    assert(one.count() > 0)
    assert(one.except(four).isEmpty && four.except(one).isEmpty)
    assert(one.except(batch).isEmpty && batch.except(one).isEmpty)
  }

  test("stream eval bucketization (Complete, decimal sum): 4-batch " +
      "split == 1-batch == batch agg") {
    // q_stream_eval's invariance lever: its scan is deterministic batch
    // post-processing, so the row is split-invariant iff the streamed
    // Complete-mode (type, hour) decimal-sum bucket table is
    val evDir = Files.createTempDirectory("streamrun-evb").toString
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_type", "ts", "value")
      .repartition(4)
      .write.mode("overwrite").parquet(evDir)
    def build(src: org.apache.spark.sql.DataFrame) =
      // cast to TZ-aware timestamp like the driver row (NTZ windows
      // resist the epoch cast; session TZ is UTC so the cast is exact)
      src.groupBy(col("event_type"),
          window(col("ts").cast("timestamp"), "3600 seconds"))
        .agg(sum(col("value")
            .cast(org.apache.spark.sql.types.DecimalType(30, 12)))
            .as("__s"),
          count(col("value")).as("__n"))
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"),
        col("window.start").cast("long").as("bucket"),
        (col("__s").cast("double") / col("__n")).as("v"))
    val one = shape(StreamRun.toTable(spark, evDir, build,
      OutputMode.Complete()))
    val four = shape(StreamRun.toTable(spark, evDir, build,
      OutputMode.Complete(), Map("maxFilesPerTrigger" -> "1")))
    val batch = shape(build(spark.read.parquet(evDir)))
    assert(one.count() > 0)
    assert(one.except(four).isEmpty && four.except(one).isEmpty)
    assert(one.except(batch).isEmpty && batch.except(one).isEmpty)
  }
}
