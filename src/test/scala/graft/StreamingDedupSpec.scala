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

  test("streaming media decode: decodeMedia over MemoryStream routes " +
      "codecs identically to batch (stateless narrow map ingest)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Multimodal
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val png = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x808080)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", b)
      b.toByteArray
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val wav = {
      val b = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(Array[Byte](0, 64, -128)), fmt, 3L),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, b)
      b.toByteArray
    }
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, png), (2L, wav), (3L, "just bytes".getBytes("UTF-8")))
    val ms = MemoryStream[(Long, Array[Byte])]
    val media = ms.toDF()
      .select(col("_1").as("media_id"), col("_2").as("data"))
    val q = Multimodal.decodeMedia(media)
      .writeStream.format("memory").queryName("media_out")
      .outputMode("append").start()
    try { ms.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "media_kind", "features").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getSeq[Double](2)))
        .sortBy(_._1).toSeq
    val streamed = canon(spark.table("media_out"))
    val batch = canon(Multimodal.decodeMedia(
      rows.toDF("media_id", "data")))
    assert(streamed == batch)
    assert(streamed.map(_._2) == Seq("image", "audio", "binary"))
  }
}
