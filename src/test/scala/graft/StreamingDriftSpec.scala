package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift
import graft.streaming.StreamingDrift

/** Windowed-PSI streaming drift: exact stream/batch parity (the same
  * plan runs both ways — PSI has no cross-window recurrence), windowed
  * isolation, and the binFractions reference helper. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val LO = 0.0
  private val HI = 99.0
  private val BINS = 10

  // uniform reference: values 0,2,…,98 land 5 in each of the 10 bins
  private def refDf = (0 until 50).map(i => i.toDouble * 2 % 100)
    .toDF("v")
  private lazy val ref = Drift.binFractions(refDf, "v", LO, HI, BINS)

  private def runStream(rows: Seq[(String, Long, Double)]) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().select(col("_1").as("k"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("v"))
    val out = StreamingDrift.psiStream(df, Seq("k"), "ts", "v",
      windowSec = 100, latenessSec = 0, LO, HI, BINS, ref)
    val name = s"psi_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      ms.addData(("adv", 10000L, 0.0)); q.processAllAvailable()
      ms.addData(("adv", 10010L, 0.0)); q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .select(col("k"), unix_timestamp(col("window_start")).as("w"),
        col("n"), col("psi"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
  }

  test("binFractions: add-one smoothing, every bin present, sums to ~1") {
    assert(ref.length === BINS)
    assert(ref.forall(_ > 0.0)) // empty high bins carry the smoothed floor
    assert(math.abs(ref.sum - 1.0) < 1e-12)
    // 5 rows per bin, smoothed: (5+1)/(50+10) = 0.1 everywhere
    assert(ref.forall(f => math.abs(f - 0.1) < 1e-12))
    // an empty bin carries the smoothed floor, not zero
    val lowHalf = Drift.binFractions(
      (0 until 50).map(i => (i % 50).toDouble).toDF("v"), "v", LO, HI, BINS)
    assert(lowHalf.drop(5).forall(f => math.abs(f - 1.0 / 60) < 1e-12))
  }

  test("stream ≡ batch on the same rows (exact: integer counts, fixed " +
      "fold order), windows isolated, shifted window alarms") {
    // window [0,100): same shape as the reference (low half);
    // window [100,200): all mass in the top bin — drifted
    val rows = (0 until 50).map(i =>
      ("a", (i % 10).toLong, i.toDouble * 2 % 100)) ++
      (0 until 50).map(i => ("a", 150L, 95.0))
    val got = runStream(rows)
    val batch = StreamingDrift.psiStream(
      rows.toDF("k", "secs", "v")
        .withColumn("ts", timestamp_seconds(col("secs"))),
      Seq("k"), "ts", "v", 100, 0, LO, HI, BINS, ref)
      .filter(col("k") === "a")
      .select(col("k"), unix_timestamp(col("window_start")).as("w"),
        col("n"), col("psi"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(batch.keySet.subsetOf(got.keySet))
    for ((k, (n, psi)) <- batch) {
      assert(got(k)._1 === n, k)
      assert(got(k)._2 === psi, k) // EXACT — same plan, same arithmetic
    }
    // in-distribution window is calm, shifted window is loud
    assert(got(("a", 0L))._2 < 0.1)
    assert(got(("a", 100L))._2 > 0.25)
  }
}
