package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Temporal}

/** Unit coverage for the Temporal operator family: semantics against
  * hand-computed or naive-plan references, plus plan-shape assertions
  * (the as-of join must be join-free; the interval join must be an
  * equi-join, not a nested loop).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf: DataFrame = Seq(
    // (key, ts, lval)
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 4.0), ("b", 5L, 5.0),
    ("c", 50L, 6.0) // key with no right rows at all
  ).toDF("k", "lts", "lval")

  private def rightDf: DataFrame = Seq(
    // (key, ts, rval)
    ("a", 8L, 100.0), ("a", 20L, 200.0), ("a", 25L, 300.0),
    ("b", 99L, 400.0)
  ).toDF("k", "rts", "rval")

  test("cusum: hand-computed two-sided trace, reset after drift clears, " +
      "alarm thresholding, keys independent") {
    // target 10, k=1, h=11; shift up then crash down
    val vs = Seq(10.0, 10.0, 15.0, 15.0, 15.0, 9.0, 3.0, 3.0)
    val df = (vs.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) } ++
      Seq(("b", 0L, 25.0)))  // a second key must not share state
      .toDF("key", "bucket", "v")
    val out = Temporal.cusum(df, Seq("key"), "bucket", "v", lit(10.0),
        k = 1.0, h = 11.0)
      .orderBy("key", "bucket")
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    val expA = Seq(
      (0.0, 0.0, false), (0.0, 0.0, false), (4.0, 0.0, false),
      (8.0, 0.0, false), (12.0, 0.0, true),   // sustained up-shift alarms
      (10.0, 0.0, false),                     // decays below h: resets
      (2.0, 6.0, false), (0.0, 12.0, true))   // down-crash alarms
    assert(out.take(8).toSeq === expA.map { case (u, d, a) => ("a", u, d, a) })
    assert(out(8) === (("b", 14.0, 0.0, true))) // 25−10−1, independent
  }

  test("asofJoin backward: greatest right ts <= left ts, else null") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts",
        payload = Seq("rval"))
      .select("k", "lts", "r_rval").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(out === Set(
      ("a", 10L, Some(100.0)), // 8 <= 10
      ("a", 20L, Some(200.0)), // equal ts matches (inclusive)
      ("a", 30L, Some(300.0)),
      ("b", 15L, None),        // only right row is at 99 > 15
      ("b", 5L, None),
      ("c", 50L, None)))       // no right rows for key
  }

  test("asofJoin forward: smallest right ts >= left ts") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts",
        payload = Seq("rval"), forward = true)
      .select("k", "lts", "r_rval").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(out === Set(
      ("a", 10L, Some(200.0)), // next at 20
      ("a", 20L, Some(200.0)), // inclusive
      ("a", 30L, None),        // nothing after 25? 25 < 30 → none
      ("b", 15L, Some(400.0)),
      ("b", 5L, Some(400.0)),
      ("c", 50L, None)))
  }

  test("asofJoin tolerance nulls out matches beyond the horizon") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts",
        payload = Seq("rval"), tolerance = Some(2L))
      .select("k", "lts", "r_rval").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(out === Set(
      ("a", 10L, Some(100.0)), // gap 2 <= 2
      ("a", 20L, Some(200.0)), // gap 0
      ("a", 30L, None),        // nearest is 25, gap 5 > 2
      ("b", 15L, None), ("b", 5L, None), ("c", 50L, None)))
  }

  test("asofJoin matches the naive per-key argmax join") {
    // randomized cross-check on a denser frame
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(200)(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "lts", "lid")
    val r = Seq.tabulate(300)(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "rts", "rval")
      // de-dup (k, rts) so the naive argmax is unique
      .groupBy("k", "rts").agg(max("rval").as("rval"))
    val got = Temporal.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rval"))
      .select("lid", "r_rval").as[(Long, Option[Double])].collect().toMap
    val naive = l.join(r, l("k") === r("k") && r("rts") <= l("lts"), "left")
      .groupBy("lid").agg(max(struct(col("rts"), col("rval"))).as("m"))
      .select(col("lid"), col("m.rval"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got === naive)
  }

  test("asofJoin plan is join-free (one window, no Join node)") {
    val plan = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts",
      Seq("rval")).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"expected no join in:\n$plan")
  }

  test("intervalJoin matches the naive theta join, each pair once") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(300)(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(5000).toLong, i.toLong))
      .toDF("k", "ts", "pid")
    val ivs = Seq.tabulate(60)(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(5000).toLong, i.toLong))
      .map { case (k, s, id) => (k, s, s + 1 + rnd.nextInt(900), id) }
      .toDF("k", "s", "e", "iid")
    val got = Temporal.intervalJoin(pts, ivs, Seq("k"), "ts", "s", "e", 256L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val naive = pts.join(ivs.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === naive)
    assert(got.distinct === got, "no duplicate pairs")
  }

  test("intervalJoin plans an equi-join (SortMerge/Hash, not NestedLoop)") {
    val pts = Seq(("a", 10L, 1L)).toDF("k", "ts", "pid")
    val ivs = Seq(("a", 5L, 15L, 1L)).toDF("k", "s", "e", "iid")
    val plan = Temporal.intervalJoin(pts, ivs, Seq("k"), "ts", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"expected equi-join in:\n$plan")
  }

  test("sessionize splits on gap and is 0-based per key") {
    val df = Seq(
      ("u1", 0L), ("u1", 50L), ("u1", 200L), ("u1", 210L), ("u1", 500L),
      ("u2", 1000L)
    ).toDF("u", "ts")
    val got = Temporal.sessionize(df, Seq("u"), "ts", gapTicks = 100L)
      .select("u", "ts", "session_id").as[(String, Long, Long)]
      .collect().toSet
    assert(got === Set(
      ("u1", 0L, 0L), ("u1", 50L, 0L),     // gap 50 <= 100
      ("u1", 200L, 1L), ("u1", 210L, 1L),  // gap 150 > 100 → new
      ("u1", 500L, 2L),
      ("u2", 1000L, 0L)))
  }

  test("counterRate handles resets as restart-from-zero") {
    val df = Seq(
      // key, ts, counter: grows 0→40, resets to 5 (inc 5), grows to 25
      ("s", 0L, 0L), ("s", 10L, 40L), ("s", 20L, 5L), ("s", 30L, 25L),
      // second bucket
      ("s", 100L, 30L)
    ).toDF("k", "ts", "c")
    val got = Temporal.counterRate(df, Seq("k"), "ts", "c", bucketSec = 100L)
      .select("k", "bucket", "rate").as[(String, Long, Option[Double])]
      .collect().toSet
    // bucket 0: incs = (40, 5, 20) → 65/100; bucket 100: inc = 5 → 5/100
    assert(got === Set(("s", 0L, Some(0.65)), ("s", 100L, Some(0.05))))
  }

  test("ewma equals the sequential recurrence per key") {
    val rnd = new scala.util.Random(3)
    val rows = for (k <- Seq("a", "b"); i <- 0 until 50)
      yield (k, i.toLong * 60, rnd.nextDouble() * 10)
    val df = rows.toDF("k", "b", "v")
    val got = Temporal.ewma(df, Seq("k"), "b", "v", alpha = 0.25)
      .select("k", "b", "ewma").as[(String, Long, Double)]
      .collect().groupBy(_._1).map { case (k, a) =>
        k -> a.sortBy(_._2).map(_._3).toSeq }
    val want = rows.groupBy(_._1).map { case (k, a) =>
      val vs = a.sortBy(_._2).map(_._3)
      k -> vs.tail.scanLeft(vs.head)((e, v) => 0.25 * v + 0.75 * e).toSeq
    }
    for (k <- Seq("a", "b"); (g, w) <- got(k).zip(want(k)))
      assert(math.abs(g - w) < 1e-12, s"key $k")
  }

  test("crossCorr finds a planted lag; rollingCorr windows correctly") {
    // y_t = x_{t-2}: y LAGS x by 2 buckets → best lag = +2
    val rnd = new scala.util.Random(9)
    val x = Seq.tabulate(200)(i => (i.toLong, rnd.nextDouble()))
    val xm = x.toMap
    val rows = x.collect { case (b, v) if b >= 2 =>
      (b, v, xm(b - 2)) }
    val df = rows.toDF("bucket", "x", "y")
    val cc = Temporal.crossCorr(df, Nil, "bucket", "x", "y",
        maxLag = 4, step = 1L)
      .select("lag", "xcorr").as[(Long, Double)].collect().toMap
    assert(math.abs(cc(2L) - 1.0) < 1e-9, s"lag 2 corr = ${cc(2L)}")
    assert(cc.filter(_._1 != 2L).values.forall(math.abs(_) < 0.3))
    // rolling corr over a window where x == y is exactly 1
    val same = x.toDF("bucket", "x").withColumn("y", col("x"))
    val rc = Temporal.rollingCorr(same, Nil, "bucket", "x", "y", 10)
      .filter(col("bucket") >= 9).select("roll_corr").as[Double].collect()
    assert(rc.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("semanticDedup drops within-cell near-dups; cap excludes hot cells") {
    // two tight clusters + isolated points; centroids = the two anchors
    val base = Seq(1.0, 0.0, 0.0, 0.0)
    val other = Seq(0.0, 1.0, 0.0, 0.0)
    def jitter(v: Seq[Double], eps: Double, i: Int): Seq[Double] =
      v.updated(2, eps * (i + 1))
    val rows =
      (0 until 4).map(i => (i.toLong, jitter(base, 0.01, i))) ++
      (4 until 8).map(i => (i.toLong, jitter(other, 0.01, i))) ++
      Seq((8L, Seq(0.0, 0.0, 0.0, 1.0)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Array(base.toArray, other.toArray)
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      cents, tau = 0.99).select("vec_id").as[Long].collect().toSet
    assert(kept === Set(0L, 4L, 8L), "one survivor per cluster + isolate")
    // with a cap of 3, both 4-member cells are dropped from candidacy:
    // nothing is removed
    val keptCap = Similarity.semanticDedup(df, "vec_id", "embedding",
      cents, tau = 0.99, maxCell = 3).select("vec_id").as[Long]
      .collect().toSet
    assert(keptCap === rows.map(_._1).toSet)
  }

  test("mergeIntervals: overlap + touching merge, nested absorb, disjoint survive, per-key isolation") {
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap -> [0,20)
      ("a", 20L, 30L),                  // touching -> merges (default)
      ("a", 40L, 50L),                  // disjoint island
      ("a", 41L, 45L),                  // nested -> absorbed
      ("b", 0L, 5L)                     // other key untouched
    ).toDF("k", "s", "e")
    val out = Temporal.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("k", "s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("a", 0L, 30L, 3L), ("a", 40L, 50L, 2L), ("b", 0L, 5L, 1L)))
    val strict = Temporal.mergeIntervals(iv, Seq("k"), "s", "e",
        mergeTouching = false)
      .orderBy("k", "s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(strict.toSeq === Seq(
      ("a", 0L, 20L, 2L), ("a", 20L, 30L, 1L),
      ("a", 40L, 50L, 2L), ("b", 0L, 5L, 1L)))
  }

  test("timeWeightedAvg: hold-until-next weighting, bucket-end close, head gap excluded, uniform ≡ plain avg") {
    // key "a", bucket [0,100): samples at t=10 (v=1), t=20 (v=3), t=90
    // (v=5). Holds: 10s@1, 70s@3, 10s@5 → twa = (10+210+50)/90 = 3.0;
    // the [0,10) head gap is excluded (covered = 90, not 100).
    val df = Seq(("a", 10L, 1.0), ("a", 20L, 3.0), ("a", 90L, 5.0),
      ("b", 0L, 2.0), ("b", 50L, 4.0)) // b: 50s@2 + 50s@4 → 3.0, covered 100
      .toDF("k", "t", "v")
    val out = Temporal.timeWeightedAvg(df, Seq("k"), "t", "v", 100L)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(("a", 0L, 3.0, 90L, 3L),
      ("b", 0L, 3.0, 100L, 2L)))

    // evenly-spaced samples make twa coincide with the plain mean
    val even = (0 until 10).map(i => ("u", i * 10L, (i % 4).toDouble))
      .toDF("k", "t", "v")
    val twa = Temporal.timeWeightedAvg(even, Seq("k"), "t", "v", 100L)
      .head().getDouble(2)
    val mean = even.agg(avg("v")).head().getDouble(0)
    assert(math.abs(twa - mean) < 1e-12)

    // duplicated instant: the earlier duplicate (by tie order) holds 0s
    val dup = Seq(("d", 0L, 100.0, 1L), ("d", 0L, 2.0, 2L),
      ("d", 50L, 4.0, 3L)).toDF("k", "t", "v", "id")
    val dOut = Temporal.timeWeightedAvg(dup, Seq("k"), "t", "v", 100L,
        tieCols = Seq("id")).head()
    assert(dOut.getDouble(2) === 3.0) // 50s@2 + 50s@4; the 100.0 holds 0s
    assert(dOut.getLong(3) === 100L)
  }

  test("sessionize ≡ Spark's native session_window on timestamped data (gap semantics cross-check)") {
    val rnd = new scala.util.Random(23)
    val evs = Seq.tabulate(200) { _ =>
      (s"u${rnd.nextInt(4)}", (1 + rnd.nextInt(5000)).toLong)
    }.distinct
    val df = evs.toDF("k", "sec")
    val gap = 300L
    // custom operator: per-key 0-based session ids over integer ticks
    val custom = Temporal.sessionize(df, Seq("k"), "sec", gapTicks = gap)
      .groupBy("k", "session_id")
      .agg(min("sec").as("start_s"), max("sec").as("end_s"),
        count(lit(1)).as("n"))
      .select("k", "start_s", "end_s", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // Spark built-in: session_window closes after `gap` of silence; its
    // window END is last-event + gap, so start/count must match and
    // end = our end + gap
    val native = df
      .withColumn("ts", timestamp_seconds(col("sec")))
      .groupBy(col("k"), session_window(col("ts"), s"$gap seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        (unix_timestamp(col("session_window.end")) - gap).as("end_s"),
        col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(custom === native,
      s"custom ${custom.size} sessions vs native ${native.size}")
  }

  test("saltedJoin: row-identical to the plain join (inner + left), hot key spread over salts") {
    import graft.operators.Skew
    val hot = (1 to 500).map(i => ("hot", i.toLong)) ++
      Seq(("cold", 1L), ("orphan", 9L))
    val left = hot.toDF("k", "v")
    val right = Seq(("hot", 10.0), ("hot", 20.0), ("cold", 5.0),
      ("unmatched", 1.0)).toDF("k", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").collect()
        .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("null"))).sorted
    assert(canon(Skew.saltedJoin(left, right, Seq("k"), 8)).toSeq ===
      canon(left.join(right, Seq("k"), "inner")).toSeq)
    assert(canon(Skew.saltedJoin(left, right, Seq("k"), 8, "left")).toSeq ===
      canon(left.join(right, Seq("k"), "left")).toSeq)
    // the hot key's rows really do carry multiple salts
    val salts = left.withColumn("__salt",
        pmod(xxhash64(left.columns.map(col): _*), lit(8L)))
      .filter(col("k") === "hot").select("__salt").distinct().count()
    assert(salts > 1, s"expected >1 distinct salts for the hot key, got $salts")
  }

  test("mergeIntervals property: random corpora — islands disjoint, union of points preserved, members partition the input") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(40)
      val iv = (1 to n).map { _ =>
        val s = rnd.nextInt(100).toLong
        (s, s + 1 + rnd.nextInt(20))
      }
      val merged = Temporal.mergeIntervals(
          iv.toDF("s", "e"), Nil, "s", "e")
        .orderBy("s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // islands strictly separated (touching would have merged)
      merged.sliding(2).foreach {
        case Array((_, e1, _), (s2, _, _)) =>
          assert(s2 > e1, s"trial $trial: islands [$e1] and [$s2] touch/overlap")
        case _ =>
      }
      // member counts partition the input
      assert(merged.map(_._3).sum == n.toLong, s"trial $trial")
      // covered integer points identical to the naive union
      val naive = iv.flatMap { case (s, e) => s until e }.toSet
      val got = merged.flatMap { case (s, e, _) => s until e }.toSet
      assert(got == naive, s"trial $trial")
    }
  }

  test("seasonalDecompose identity: v == trend + seasonal + resid wherever trend is defined") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map(b => ("k", b, rnd.nextDouble() * 100.0))
    val out = Temporal.seasonalDecompose(rows.toDF("key", "bucket", "v"),
        Seq("key"), "bucket", "v", period = 12)
      .filter(col("trend").isNotNull)
      .select("v", "trend", "seasonal", "resid").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (v, t, s, e) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(v - (t + s + e)) < 1e-9, s"$v != $t + $s + $e")
    }
  }
}
