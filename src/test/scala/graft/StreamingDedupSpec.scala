package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(key: org.apache.spark.sql.Column = null)(
      batches: Seq[Seq[(Long, Long, String)]]): Seq[(Long, String)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val docs = ms.toDF().select(col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("text"))
    val out = StreamingDedup.dedupStream(docs, "ts", latenessSec = 60,
      key = key)
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table("dedup_out").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
  }

  test("exact streaming dedup: first copy survives within and across " +
      "micro-batches; distinct texts all pass") {
    val got = runStream()(Seq(
      Seq((1L, 10L, "alpha beta"), (2L, 11L, "alpha beta"),
        (3L, 12L, "gamma delta")),
      // cross-batch duplicate (within the 60 s horizon) + a new doc
      Seq((4L, 20L, "alpha beta"), (5L, 21L, "epsilon zeta"))))
    assert(got == Seq((1L, "alpha beta"), (3L, "gamma delta"),
      (5L, "epsilon zeta")))
  }

  test("canonical-fingerprint key dedups case/punct-edited mirrors") {
    val got = runStream(TextAnalysis.fingerprint(col("text")))(Seq(
      Seq((1L, 10L, "Hello, World!"), (2L, 11L, "hello  world"),
        (3L, 12L, "different text"))))
    assert(got.map(_._1) == Seq(1L, 3L))
  }

  test("simhash key dedups identical token streams, keeps distinct docs") {
    val got = runStream(StreamingDedup.simhashKey(col("text")))(Seq(
      Seq((1L, 10L, "spark query engine fast scan join"),
        (2L, 11L, "spark query engine fast scan join"),
        (3L, 12L, "completely unrelated words entirely elsewhere"))))
    assert(got.map(_._1) == Seq(1L, 3L))
  }
}
