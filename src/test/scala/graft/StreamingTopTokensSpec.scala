package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingTopTokens

/** Windowed heavy hitters in streams: exact stream/batch parity below
  * sketch capacity, window isolation, and the SpaceSaving presence
  * guarantee under eviction pressure. */
class StreamingTopTokensSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(rows: Seq[(String, Long, String)], k: Int,
      capacity: Int) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, String)]
    val df = ms.toDF().select(col("_1").as("g"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("text"))
    val out = StreamingTopTokens.topTokensStream(df, Seq("g"), "ts",
      "text", windowSec = 100, latenessSec = 0, k, capacity)
    val name = s"tt_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      ms.addData(("adv", 100000L, "x")); q.processAllAvailable()
      ms.addData(("adv", 100100L, "x")); q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("g") =!= "adv")
      .select(col("g"), unix_timestamp(col("window_start")).as("w"),
        col("token"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
  }

  test("stream ≡ batch below capacity; windows isolated; rank order " +
      "cnt-desc token-asc") {
    // window [0,100): aa×3, bb×2, cc×1; window [100,200): cc×4, aa×1
    val rows = Seq(
      ("g", 10L, "aa bb aa"), ("g", 20L, "aa bb cc"),
      ("g", 150L, "cc cc"), ("g", 160L, "cc cc aa"))
    val got = runStream(rows, k = 2, capacity = 64)
    val batch = StreamingTopTokens.topTokensStream(
      rows.toDF("g", "secs", "text")
        .withColumn("ts", timestamp_seconds(col("secs"))),
      Seq("g"), "ts", "text", 100, 0, k = 2, capacity = 64)
      .select(col("g"), unix_timestamp(col("window_start")).as("w"),
        col("token"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
    assert(got === batch)
    assert(got === Set(("g", 0L, "aa", 3L), ("g", 0L, "bb", 2L),
      ("g", 100L, "cc", 4L), ("g", 100L, "aa", 1L)))
  }

  test("SpaceSaving presence guarantee survives streaming merges: a " +
      "token above tokens/capacity is reported under eviction pressure") {
    // 40 distinct rare tokens + 'hot'×30 through a capacity-8 sketch:
    // 70 tokens, threshold 70/8 ≈ 8.75 < 30 ⇒ 'hot' MUST surface
    val rare = (0 until 40).map(i => ("g", (i % 90).toLong, s"r$i"))
    val hot = (0 until 30).map(i => ("g", (i % 90).toLong, "hot"))
    val got = runStream(rare ++ hot, k = 3, capacity = 8)
    val hotRow = got.find(_._3 == "hot")
    assert(hotRow.isDefined, s"hot missing from $got")
    assert(hotRow.get._4 >= 30L) // SpaceSaving counts OVERestimate
  }
}
