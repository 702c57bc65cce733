package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal
import graft.streaming.StreamingCusum
import graft.streaming.StreamingCusum.CusumRow

class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

  private val T = 10.0
  private val K = 1.0
  private val H = 11.0

  private def run(batches: Seq[Seq[(String, Long, Double)]],
      latenessSec: Long = 0L): Seq[CusumRow] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().select(col("_1").as("k"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("v"))
    val out = StreamingCusum.cusumStream(df, "k", "ts", "v",
      bucketSec = 100, latenessSec = latenessSec, target = T, k = K, h = H)
    val name = s"cusum_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[CusumRow].collect()
      .sortBy(r => (r.key, r.bucket)).toSeq
  }

  test("buckets close in order and carry the fold; sustained shift alarms") {
    // key a buckets: [0,100)=15, [100,200)=15, [200,300)=15 → up 4, 8, 12
    val got = run(Seq(
      Seq(("a", 10L, 14.0), ("a", 20L, 16.0)),   // bucket 0 mean 15
      Seq(("a", 150L, 15.0), ("a", 250L, 15.0)),
      Seq(("adv", 1000L, 0.0)), Seq(("adv", 1010L, 0.0))))
      .filter(_.key == "a")
    assert(got.map(_.bucket) === Seq(0L, 100L, 200L))
    assert(got.map(_.cusumUp) === Seq(4.0, 8.0, 12.0))
    assert(got.map(_.alarm) === Seq(false, false, true))
  }

  test("sample for an already-closed bucket is dropped, fold not rewritten") {
    val got = run(Seq(
      Seq(("a", 10L, 15.0)),
      Seq(("adv", 1000L, 0.0)), Seq(("adv", 1010L, 0.0)), // close bucket 0
      Seq(("a", 20L, 99.0)),                              // behind watermark
      Seq(("adv", 2000L, 0.0)), Seq(("adv", 2010L, 0.0))))
      .filter(_.key == "a")
    assert(got.map(r => (r.bucket, r.v, r.cusumUp)) === Seq((0L, 15.0, 4.0)))
  }

  test("streaming cusum ≡ batch Temporal.cusum on random multi-key data") {
    val rnd = new scala.util.Random(23)
    val rows = for {
      key <- Seq("a", "b", "c")
      b <- 0 until 8
      i <- 0 until (1 + rnd.nextInt(3))
    } yield (key, b * 100L + 1 + rnd.nextInt(98),
      math.floor(rnd.nextDouble() * 30 * 100) / 100)
    val got = run(Seq(rows,
      Seq(("adv", 100000L, 0.0)), Seq(("adv", 100100L, 0.0))))
      .filterNot(_.key == "adv")
    val series = rows.toDF("key", "sec", "v")
      .withColumn("bucket", (col("sec") - pmod(col("sec"), lit(100L))))
      .groupBy("key", "bucket").agg(avg(col("v")).as("v"))
    val batch = Temporal.cusum(series, Seq("key"), "bucket", "v",
        lit(T), k = K, h = H)
      .orderBy("key", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.size === batch.length)
    got.zip(batch).foreach { case (s, (bk, bb, bv, bu, bd, ba)) =>
      assert(s.key === bk && s.bucket === bb, s"$s vs $bk/$bb")
      assert(math.abs(s.v - bv) < 1e-9 && math.abs(s.cusumUp - bu) < 1e-9 &&
        math.abs(s.cusumDn - bd) < 1e-9 && s.alarm === ba, s"$s")
    }
  }
}
