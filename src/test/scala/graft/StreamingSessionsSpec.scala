package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.ClosedSession

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  /** Run batches of (key, sec, value) through sessionStream(gap=100),
    * returning emitted sessions in order. Lateness 0: watermark = max
    * seen event time. */
  private def run(batches: Seq[Seq[(String, Long, Double)]]):
      Seq[ClosedSession] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().select(col("_1").as("k"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("v"))
    val out = StreamingSessions.sessionStream(df, "k", "ts", "v",
      gapSec = 100, latenessSec = 0)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table("sess_out").as[ClosedSession].collect()
      .sortBy(s => (s.key, s.start_s)).toSeq
  }

  test("in-batch gap closes a session immediately; timeout closes the " +
      "trailing one when the watermark passes end + gap") {
    val got = run(Seq(
      // u1: [10, 20] then gap > 100 → [500]; the first closes in-batch
      Seq(("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u1", 500L, 3.0)),
      // u2 far in the future: advances watermark beyond 500 + 100
      Seq(("u2", 1000L, 9.0)),
      // one more batch so the fired timeout is processed
      Seq(("u2", 1010L, 1.0))))
    val u1 = got.filter(_.key == "u1")
    assert(u1 === Seq(
      ClosedSession("u1", 10L, 20L, 2, 3.0),
      ClosedSession("u1", 500L, 500L, 1, 3.0)))
  }

  test("cross-batch events within the gap extend the open session") {
    val got = run(Seq(
      Seq(("u1", 10L, 1.0)),
      Seq(("u1", 80L, 2.0)),                    // 70 <= gap: extends
      Seq(("adv", 1000L, 0.0)),                 // watermark forward
      Seq(("adv", 1010L, 0.0))))                // trigger timeout delivery
    val u1 = got.filter(_.key == "u1")
    assert(u1 === Seq(ClosedSession("u1", 10L, 80L, 2, 3.0)))
  }

  test("independent keys keep independent sessions") {
    val got = run(Seq(
      Seq(("a", 10L, 1.0), ("b", 15L, 2.0), ("a", 30L, 1.0)),
      Seq(("adv", 1000L, 0.0)),
      Seq(("adv", 1010L, 0.0))))
    assert(got.filter(_.key == "a") ===
      Seq(ClosedSession("a", 10L, 30L, 2, 2.0)))
    assert(got.filter(_.key == "b") ===
      Seq(ClosedSession("b", 15L, 15L, 1, 2.0)))
  }

  test("streaming sessions match the batch sessionize on the same data") {
    val rnd = new scala.util.Random(5)
    val evs = Seq.tabulate(120) { i =>
      (s"u${rnd.nextInt(3)}", (i * 37 + rnd.nextInt(20)).toLong,
        rnd.nextInt(10).toDouble)
    }
    // stream: one batch with everything, then watermark-advance batches
    val got = run(Seq(evs,
      Seq(("adv", 100000L, 0.0)), Seq(("adv", 100010L, 0.0))))
      .filter(_.key.startsWith("u"))
    // batch reference on the identical rows
    val batch = graft.operators.Temporal.sessionize(
        evs.toDF("k", "sec", "v"), Seq("k"), "sec", gapTicks = 100L)
      .groupBy("k", "session_id")
      .agg(min("sec").as("start_s"), max("sec").as("end_s"),
        count(lit(1)).as("n_events"), sum("v").as("sum_v"))
      .select("k", "start_s", "end_s", "n_events", "sum_v")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(t => ClosedSession(t._1, t._2, t._3, t._4, t._5))
      .sortBy(s => (s.key, s.start_s)).toSeq
    assert(got === batch)
  }
}
