package graft

import org.apache.spark.sql.functions._

import graft.ml.FleetScan

/** Fleet-scale keyed anomaly state: the single-model run-state guarantee
  * (one start + one end per episode across eval windows,
  * worker.py:255-263) held PER SERIES with distributed state. */
class FleetScanSpec extends SparkSpec {
  import spark.implicits._

  private def scores(rows: (String, Long, Double)*) =
    rows.toDF("host", "bucket", "score")

  test("per-key episodes span batches: one start, one end, per series; " +
      "silent series carry state (and grace anchor) forward") {
    val keys = Seq("host")
    val s0 = FleetScan.emptyState(spark, keys)

    // batch 1: host a spikes (still open at window end); host b quiet
    val (scan1, st1) = FleetScan.scanWithState(
      scores(("a", 0L, 0.0), ("a", 60L, 99.9), ("a", 120L, 99.9),
        ("b", 0L, 0.0), ("b", 60L, 0.0), ("b", 120L, 0.0)),
      s0, keys, gracePeriodSec = 120L)
    assert(scan1.filter(col("anomaly") === "start").count() == 1)
    val st1c = st1.collect().map(r =>
      r.getString(0) -> (r.getBoolean(1), r.isNullAt(2), r.getDouble(2 + 1))).toMap
    assert(st1c("a") == ((true, true, 99.9)))
    assert(st1c("b") == ((false, true, 0.0)))

    // batch 2: host a still anomalous then recovers → NO second start,
    // one end; host b absent entirely → state row survives
    val (scan2, st2) = FleetScan.scanWithState(
      scores(("a", 180L, 99.9), ("a", 240L, 0.0)),
      st1, keys, gracePeriodSec = 120L)
    assert(scan2.filter(col("anomaly") === "start").count() == 0)
    assert(scan2.filter(col("anomaly") === "ongoing")
      .select("bucket").as[Long].collect().toSeq == Seq(180L))
    assert(scan2.filter(col("anomaly") === "end")
      .select("bucket").as[Long].collect().toSeq == Seq(240L))
    val st2c = st2.collect().map(r =>
      r.getString(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(st2c("a") == ((false, 240L))) // closed, grace anchored at 240
    assert(st2c.contains("b") && st2c("b") == ((false, -1L))) // carried

    // batch 3: host a re-spikes at 300 — 60s after its end, inside its
    // 120s grace → suppressed; host b spikes at 300 — fresh key history,
    // no grace → starts. Grace is PER KEY.
    val (scan3, st3) = FleetScan.scanWithState(
      scores(("a", 300L, 99.9), ("b", 300L, 99.9)),
      st2, keys, gracePeriodSec = 120L)
    val events = scan3.filter(col("anomaly") === "start")
      .select("host").as[String].collect().toSeq
    assert(events == Seq("b"))
    assert(scan3.filter(col("host") === "a" && col("anomaly").isNotNull)
      .count() == 0)
    val st3c = st3.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(st3c == Map("a" -> false, "b" -> true))
  }

  test("state table round-trips through versioned persistence") {
    val root = java.nio.file.Files.createTempDirectory("fleet").toString
    val keys = Seq("host")
    assert(FleetScan.loadState(spark, root, "f1", keys).count() == 0)
    val st = Seq(("a", true, Some(10L), 99.9), ("b", false, None, 0.0))
      .map { case (h, o, e, m) =>
        (h, o, e.map(Long.box).orNull.asInstanceOf[java.lang.Long], m) }
      .toDF("host", "open", "last_end_ts", "episode_max")
    assert(FleetScan.saveState(st, root, "f1") == 1)
    val back = FleetScan.loadState(spark, root, "f1", keys)
      .orderBy("host").collect()
    assert(back.length == 2 && back(0).getBoolean(1) && back(0).getLong(2) == 10L)
    // next save bumps the version; ACTIVE flips
    assert(FleetScan.saveState(st.filter(col("host") === "a"), root, "f1") == 2)
    assert(FleetScan.loadState(spark, root, "f1", keys).count() == 1)
  }
}
