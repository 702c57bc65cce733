package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingTwa
import graft.streaming.StreamingTwa.TwaBucket

class StreamingTwaSpec extends SparkSpec {
  import spark.implicits._

  /** Run batches of (key, sec, value) through twaStream(bucket=100),
    * returning finalized buckets. Watermark = max seen event time minus
    * `latenessSec` — rows below the watermark are dropped by the ENGINE
    * (the stateful operator's standard late-data filter), so reordering
    * tests need a real horizon. */
  private def run(batches: Seq[Seq[(String, Long, Double)]],
      latenessSec: Long = 0L): Seq[TwaBucket] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().select(col("_1").as("k"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("v"))
    val out = StreamingTwa.twaStream(df, "k", "ts", "v",
      bucketSec = 100, latenessSec = latenessSec)
    val name = s"twa_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[TwaBucket].collect()
      .sortBy(b => (b.key, b.bucket)).toSeq
  }

  test("bucket finalizes when the watermark passes its end; holds match the batch semantics") {
    val got = run(Seq(
      // a/[0,100): t=10@1, t=20@3, t=90@5 → (10+210+50)/90 = 3.0
      Seq(("a", 10L, 1.0), ("a", 20L, 3.0), ("a", 90L, 5.0)),
      Seq(("adv", 1000L, 0.0)),   // watermark past 100
      Seq(("adv", 1010L, 0.0)))) // deliver the fired timeout
      .filter(_.key == "a")
    assert(got === Seq(TwaBucket("a", 0L, 3.0, 90L, 3L)))
  }

  test("late in-horizon sample lands BETWEEN earlier ones and re-weights them") {
    // lateness 200: after batch 1 the watermark is 90 - 200 < 0, so the
    // out-of-order t=50 is IN horizon and must re-weight its neighbours
    val got = run(Seq(
      Seq(("a", 10L, 1.0), ("a", 90L, 5.0)),
      Seq(("a", 50L, 3.0)),
      Seq(("adv", 1000L, 0.0)), Seq(("adv", 1010L, 0.0))),
      latenessSec = 200L)
      .filter(_.key == "a")
    // holds: 40s@1 + 40s@3 + 10s@5 → (40+120+50)/90 = 210/90
    assert(got.size === 1)
    assert(math.abs(got.head.twa - 210.0 / 90.0) < 1e-12)
    assert(got.head.n === 3L)
  }

  test("engine drops sub-watermark rows with lateness 0 (the standard contract)") {
    val got = run(Seq(
      Seq(("a", 10L, 1.0), ("a", 90L, 5.0)),
      Seq(("a", 50L, 3.0)),                    // 50 < watermark 90: dropped
      Seq(("adv", 1000L, 0.0)), Seq(("adv", 1010L, 0.0))))
      .filter(_.key == "a")
    assert(got === Seq(TwaBucket("a", 0L, 130.0 / 90.0, 90L, 2L)))
  }

  test("sample past the horizon for a finalized bucket is dropped, not re-emitted") {
    val got = run(Seq(
      Seq(("a", 10L, 1.0)),
      Seq(("adv", 1000L, 0.0)), Seq(("adv", 1010L, 0.0)), // finalize a/0
      Seq(("a", 20L, 99.0)),                               // too late
      Seq(("adv", 2000L, 0.0)), Seq(("adv", 2010L, 0.0))))
      .filter(_.key == "a")
    assert(got === Seq(TwaBucket("a", 0L, 1.0, 90L, 1L)))
  }

  test("streaming twa matches the batch operator on random data") {
    val rnd = new scala.util.Random(13)
    // sec >= 1: the engine's initial watermark is epoch 0 and its late
    // filter drops a row AT the watermark, so an epoch-0 event would be
    // silently excluded from the stream but not from the batch
    val evs = Seq.tabulate(150) { i =>
      (s"u${rnd.nextInt(3)}", (1 + rnd.nextInt(499)).toLong,
        (rnd.nextInt(50) + 1).toDouble)
    }.distinct // distinct (key, sec, v) rows keep the sort total
    val got = run(Seq(evs,
      Seq(("adv", 100000L, 0.0)), Seq(("adv", 100010L, 0.0))),
      latenessSec = 600L)
      .filter(_.key.startsWith("u"))
    val batch = graft.operators.Temporal.timeWeightedAvg(
        evs.toDF("k", "sec", "v"), Seq("k"), "sec", "v", 100L,
        tieCols = Seq("v"))
      .select("k", "bucket", "twa", "covered", "n")
      .as[(String, Long, Double, Long, Long)].collect()
      .map(t => TwaBucket(t._1, t._2, t._3, t._4, t._5))
      .sortBy(b => (b.key, b.bucket)).toSeq
    assert(got.map(b => (b.key, b.bucket, b.covered, b.n)) ===
      batch.map(b => (b.key, b.bucket, b.covered, b.n)))
    got.zip(batch).foreach { case (g, b) =>
      assert(math.abs(g.twa - b.twa) < 1e-9, s"$g vs $b")
    }
  }
}
