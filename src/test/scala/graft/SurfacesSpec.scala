package graft

import org.apache.spark.sql.functions._

import graft.api.{DateMath, FeatureDsl, Templates}
import graft.io.{Format, ModelStore, WriteBack}
import graft.ml.Annotations
import graft.operators.{Feature, TimesQuery}
import graft.sources.Tables

/** Parity tests for the previously-untested surfaces: DateMath
  * (tests/test_misc.py), Templates, FeatureDsl parse errors,
  * Format.series/buckets JSON shapes (donut.py:331-412), ModelStore
  * save→restore→load (filestorage.py:57-236), Annotations window goldens
  * (test_donut.py:171-225), WriteBack schema (bucket.py:232-253), and the
  * CSV source (membucket.py:90-112) through a times-query golden. */
class SurfacesSpec extends SparkSpec {
  import spark.implicits._

  // ── GraftConfig (config.py:18-90, tests/test_config.py) ─────────────

  test("empty config yields the reference's default table " +
      "(test_config.test_default_config)") {
    val c = graft.api.GraftConfig.fromJson("{}")
    assert(c.metricsEnable)                   // the golden assertion
    assert(c.nodeMaster && c.nodeCompute)
    assert(c.training.numCpus === 1L && c.training.numGpus === 0L)
    assert(c.training.nice === 5L && c.training.batchSize === 64L)
    assert(c.training.epochs === 100L)
    assert(c.inference.numCpus === 1L && c.inference.numGpus === 0L)
    assert(c.server.listen === "localhost:8077")
    assert(c.server.listenAddr === (("localhost", Some(8077))))
    assert(c.server.maxTasksPerChild === 100L && c.server.jobsMaxTtl === 60L)
    assert(!c.debug)
    assert(c.buckets.isEmpty && c.scheduledJobs.isEmpty)
  }

  test("config merges buckets + legacy datasources (later shadows) and " +
      "hydrates the registry through the POST /buckets factory") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cfg_bucket").toString
    Seq((1L, 2.0)).toDF("ts", "value").write.mode("overwrite").parquet(dir)
    val json = s"""{
      "buckets": [
        {"name": "a", "type": "parquet", "path": "$dir"},
        {"name": "b", "type": "csv", "path": "/tmp/x.csv"}
      ],
      "datasources": [
        {"name": "b", "type": "parquet", "path": "$dir"}
      ],
      "metrics": {"enable": false},
      "debug": "yes"
    }"""
    val c = graft.api.GraftConfig.fromJson(json)
    assert(!c.metricsEnable && c.debug)
    assert(c.buckets.keySet === Set("a", "b"))
    val reg = new graft.sources.BucketRegistry
    val registered = c.registerBuckets(reg)
    assert(registered.map(_.name).toSet === Set("a", "b"))
    // the datasource shadowed the csv declaration: both read as parquet
    assert(reg("b").readPoints(spark).count() === 1L)
    assert(reg("a").readPoints(spark).count() === 1L)
  }

  test("config accessors coerce unambiguous types and REPORT genuine " +
      "mismatches instead of silently defaulting (voluptuous posture)") {
    // whole double + numeric string coerce; numeric listen stringifies
    val ok = graft.api.GraftConfig.fromJson(
      """{"training": {"num_cpus": 4.0, "epochs": "250"},
        |"server": {"listen": 8099},
        |"node": {"master": "yes", "compute": 0}}""".stripMargin)
    assert(ok.training.numCpus === 4L && ok.training.epochs === 250L)
    assert(ok.server.listen === "8099")
    assert(ok.nodeMaster && !ok.nodeCompute)
    // genuine mismatches throw, naming the key
    val badInt = graft.api.GraftConfig.fromJson(
      """{"server": {"workers": "abc"}}""")
    val e1 = intercept[IllegalArgumentException](badInt.server.workers)
    assert(e1.getMessage.contains("workers"))
    val badFrac = graft.api.GraftConfig.fromJson(
      """{"training": {"num_cpus": 2.5}}""")
    assert(intercept[IllegalArgumentException](badFrac.training.numCpus)
      .getMessage.contains("num_cpus"))
    val badBool = graft.api.GraftConfig.fromJson(
      """{"metrics": {"enable": [1]}}""")
    assert(intercept[IllegalArgumentException](badBool.metricsEnable)
      .getMessage.contains("enable"))
  }

  // ── ConfigCoerce (tests/test_misc.py:90-105 + misc.py:263-283) ──────

  test("parseAddr mirrors test_misc.test_parse_addr") {
    import graft.api.ConfigCoerce.parseAddr
    assert(parseAddr("localhost", Some(80)) === (("localhost", Some(80))))
    assert(parseAddr("localhost:8080", Some(80)) ===
      (("localhost", Some(8080))))
    assert(parseAddr(":9200") === (("localhost", Some(9200))))
    assert(parseAddr("10.0.0.1") === (("10.0.0.1", None)))
  }

  test("makeBool mirrors misc.make_bool's coercion table") {
    import graft.api.ConfigCoerce.makeBool
    assert(!makeBool(null))
    assert(makeBool(true) && !makeBool(false))
    assert(makeBool(1) && !makeBool(0) && makeBool("2"))
    assert(!makeBool("") && !makeBool("false") && !makeBool("no"))
    assert(makeBool("true") && makeBool("yes") && makeBool("YES"))
    intercept[IllegalArgumentException] { makeBool("maybe") }
  }

  // ── DateMath (tests/test_misc.py:22-48) ─────────────────────────────

  test("timedelta parse mirrors test_misc.test_timedelta") {
    assert(DateMath.parseDelta("4") == 4.0)
    assert(DateMath.parseDelta("42") == 42.0)
    assert(DateMath.parseDelta("+42") == 42.0)
    assert(DateMath.parseDelta("42s") == 42.0)
    assert(DateMath.parseDelta("42.0s") == 42.0)
    assert(DateMath.parseDelta("42m") == 42.0 * 60)
    assert(DateMath.parseDelta("42h") == 42.0 * 3600)
    assert(DateMath.parseDelta("42d") == 42.0 * 86400)
    assert(DateMath.parseDelta("42w") == 42.0 * 7 * 86400)
    assert(DateMath.parseDelta("-42s") == -42.0)
    assert(DateMath.parseDelta("2M") == 60.0 * 24 * 3600)
    assert(DateMath.parseDelta("2y") == 365.0 * 2 * 24 * 3600)
    for (bad <- Seq("", "foo", "42x"))
      assertThrows[IllegalArgumentException](DateMath.parseDelta(bad))
  }

  test("timestamp parse/format round-trips mirror test_misc.test_datetime") {
    assert(DateMath.parseTs("1515404366.123") == 1515404366.123)
    assert(DateMath.parseTs("2018-01-08T09:39:26.123Z") == 1515404366.123)
    assert(DateMath.formatTs(1515404366.123) == "2018-01-08T09:39:26.123Z")
    assert(DateMath.parseTs(DateMath.formatTs(1515404366.123)) == 1515404366.123)
    // relative now±delta with injected now (api-conventions.asciidoc:28-83)
    assert(DateMath.parseTs("now", nowEpoch = 1000L) == 1000.0)
    assert(DateMath.parseTs("now-5m", nowEpoch = 1000L) == 700.0)
    assert(DateMath.parseTs("now+1h", nowEpoch = 1000L) == 4600.0)
  }

  // ── Templates (model.py:149-204) ────────────────────────────────────

  test("templates substitute and discover unbound variables") {
    val tpl = """{"name": "{{ name }}", "span": {{span}}}"""
    assert(Templates.variables(tpl) == Set("name", "span"))
    assert(Templates.render(tpl, Map("name" -> "m1", "span" -> "24")) ==
      """{"name": "m1", "span": 24}""")
    val e = intercept[IllegalArgumentException](
      Templates.render(tpl, Map("name" -> "m1")))
    assert(e.getMessage.contains("span"))
  }

  // ── FeatureDsl parse (misc.py:334-342, server.py:1181-1207) ─────────

  test("feature expression parse + errors") {
    val f = FeatureDsl.parse("avg(cpu.load)")
    assert(f.metric == "avg" && f.measurement.contains("cpu") && f.field == "load")
    assert(f.name == "avg_load")
    val bare = FeatureDsl.parse("count(value)")
    assert(bare.measurement.isEmpty && bare.field == "value")
    assert(FeatureDsl.parseList("avg(m.f); count(g)").map(_.metric) ==
      Seq("avg", "count"))
    assertThrows[IllegalArgumentException](FeatureDsl.parse("avg"))
    assertThrows[IllegalArgumentException](FeatureDsl.parse("avg()"))
    assertThrows[graft.functions.Metrics.UnsupportedMetric](
      FeatureDsl.parse("nope(f)"))
  }

  // ── Format.series / Format.buckets (donut.py:331-412) ───────────────

  test("format_series columnar JSON shape, NaN→null") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val df = Seq(
      (0L, 1.5, 1.4, 1.0, 1.8),
      (10L, Double.NaN, 1.5, 1.1, 1.9))
      .toDF("bucket", "cpu", "predicted", "lower", "upper")
    val j = JsonMethods.parse(Format.series(df, Seq("cpu"), predicted = true))
    assert((j \ "timestamps") == JArray(List(JInt(0), JInt(10))))
    (j \ "observed" \ "cpu") match {
      case JArray(List(JDouble(1.5), JNull)) => () // NaN→null (misc.py:345-356)
      case other => fail(s"bad observed: $other")
    }
    (j \ "predicted" \ "predicted") match {
      case JArray(List(JDouble(1.4), JDouble(1.5))) => ()
      case other => fail(s"bad predicted: $other")
    }
  }

  test("format_buckets row-wise JSON with per-bucket stats") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val df = Seq((0L, 2.0, 87.5, true), (10L, 3.0, 10.0, false))
      .toDF("bucket", "cpu", "score", "is_anomaly")
    val JArray(rows) = JsonMethods.parse(Format.buckets(df, Seq("cpu")))
    assert(rows.length == 2)
    assert((rows.head \ "timestamp") == JInt(0))
    assert((rows.head \ "stats" \ "score") == JDouble(87.5))
    assert((rows.head \ "stats" \ "anomaly") == JBool(true))
    assert((rows.head \ "values" \ "cpu") == JDouble(2.0))
  }

  // ── WriteBack (bucket.py:232-253, donut.py:293-319) ─────────────────

  test("write-back schema: predicted under feature, observed under @feature") {
    val scored = Seq((0L, 1.0, 1.1, 0.8, 1.4, 12.5, false))
      .toDF("bucket", "observed", "predicted", "lower", "upper", "score", "is_anomaly")
    val out = WriteBack.predictionFrame(scored, "cpu", "m1")
    assert(out.columns.toSet == Set("bucket", "cpu", "@cpu", "lower_cpu",
      "upper_cpu", "score", "model", "is_anomaly"))
    val r = out.collect()(0)
    assert(r.getDouble(r.fieldIndex("cpu")) == 1.1)     // predicted
    assert(r.getDouble(r.fieldIndex("@cpu")) == 1.0)    // observed
    assert(r.getString(r.fieldIndex("is_anomaly")) == "false") // tag = string
    // partitioned parquet sink round-trip (date partition pruning at scale)
    val dir = java.nio.file.Files.createTempDirectory("wb").toString + "/sink"
    WriteBack.save(out, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1 && back.columns.contains("date"))
  }

  test("write-back consumes io direction: input-only feature contributes " +
      "no value columns (model.py:126-127)") {
    val scored = Seq((0L, 1.0, 1.1, 0.8, 1.4, 12.5, false))
      .toDF("bucket", "observed", "predicted", "lower", "upper", "score", "is_anomaly")
    val out = WriteBack.predictionFrame(scored, "cpu", "m1", io = "i")
    assert(out.columns.toSet == Set("bucket", "score", "model", "is_anomaly"))
    // and 'io' (the default) still writes everything
    assert(WriteBack.predictionFrame(scored, "cpu", "m1", io = "io")
      .columns.toSet.contains("cpu"))
  }

  // ── ModelStore (filestorage.py:57-236) ──────────────────────────────

  test("versioned checkpoints: save, ACTIVE pointer, restore, load") {
    val root = java.nio.file.Files.createTempDirectory("store").toString
    val p1 = Seq((0L, 1.0)).toDF("slot", "mu")
    val p2 = Seq((0L, 2.0)).toDF("slot", "mu")
    assert(ModelStore.save(p1, """{"v":1}""", root, "m") == 1)
    assert(ModelStore.save(p2, """{"v":2}""", root, "m") == 2)
    assert(ModelStore.listVersions(root, "m") == Seq(1, 2))
    assert(ModelStore.activeVersion(root, "m").contains(2))
    val (prof2, json2) = ModelStore.load(spark, root, "m")
    assert(json2 == """{"v":2}""" && prof2.collect()(0).getDouble(1) == 2.0)
    // _restore points ACTIVE back (server.py:890-904)
    ModelStore.restore(root, "m", 1)
    val (prof1, json1) = ModelStore.load(spark, root, "m")
    assert(json1 == """{"v":1}""" && prof1.collect()(0).getDouble(1) == 1.0)
    assertThrows[IllegalArgumentException](ModelStore.restore(root, "m", 9))
  }

  // ── Annotations (test_donut.py:171-225 _format_windows goldens) ─────

  test("annotation window flag/exclude mirror _format_windows goldens") {
    // range [100,200[ step 10 — the reference's exact cases
    val buckets = (100L until 200L by 10L).map(Tuple1(_)).toDF("bucket")
    def flags(ws: Seq[(Long, Long)]): Seq[Boolean] = {
      val w = ws.toDF("start_ts", "end_ts")
      Annotations.flagWindows(buckets, w).orderBy("bucket")
        .select("is_abnormal").as[Boolean].collect().toSeq
    }
    assert(flags(Seq((50L, 90L), (200L, 220L))) == Seq.fill(10)(false))
    assert(flags(Seq((100L, 200L))) == Seq.fill(10)(true))
    assert(flags(Seq((150L, 160L))) ==
      Seq(false, false, false, false, false, true, false, false, false, false))
    assert(flags(Seq((50L, 110L), (190L, 240L))) ==
      Seq(true, false, false, false, false, false, false, false, false, true))
    // exclusion drops exactly the flagged buckets
    val w = Seq((150L, 160L)).toDF("start_ts", "end_ts")
    assert(Annotations.excludeWindows(buckets, w).count() == 9)
    // inRange: list_anomalies overlap semantics (influx.py:662-694)
    val anns = Seq((10L, 20L, "a"), (30L, 40L, "b")).toDF("start_ts", "end_ts", "text")
    assert(Annotations.inRange(anns, 15L, 35L).count() == 2)
    assert(Annotations.inRange(anns, 20L, 30L).count() == 0) // [from,to[ exclusive
  }

  // ── Constraint test on forecast (misc.py:311-330, worker.py:299-318) ─

  test("forecast constraint: parse + first violation") {
    import graft.ml.Constraints
    val c = Constraints.parse("cpu:high:80.5")
    assert(c == Constraints.Constraint("cpu", "high", 80.5))
    assertThrows[IllegalArgumentException](Constraints.parse("cpu:high"))
    assertThrows[IllegalArgumentException](Constraints.parse("cpu:sideways:1"))
    assertThrows[IllegalArgumentException](Constraints.parse("cpu:low:xx"))
    val fc = Seq((0L, 50.0), (10L, 85.0), (20L, 90.0))
      .toDF("bucket", "predicted")
    assert(Constraints.firstViolation(fc, c) == Some((10L, 85.0)))
    assert(Constraints.firstViolation(fc,
      Constraints.Constraint("cpu", "low", 40.0)).isEmpty)
    assert(Constraints.firstViolation(fc,
      Constraints.Constraint("cpu", "low", 60.0)) == Some((0L, 50.0)))
  }

  test("top-N abnormal keys from a keyed scan (server.py:1605-1626)") {
    import graft.ml.{AnomalyScan, Constraints}
    val scores = Seq(
      ("a", 0L, 99.9), ("a", 3L, 99.8), ("b", 0L, 50.0), ("b", 3L, 99.95),
      ("c", 0L, 10.0), ("c", 3L, 20.0))
      .toDF("host", "bucket", "score")
    val scanned = AnomalyScan.scan(scores, maxThreshold = 99.7,
      minThreshold = 68.0, seriesKeys = Seq("host"))
    val top = Constraints.topAbnormalKeys(scanned, Seq("host"), 2).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("b", "a"))
    assert(top(1).getLong(top(1).fieldIndex("n_anomalies")) == 2L)
  }

  // ── Time offset vs first bucket (influx.py:591-612) ─────────────────

  test("time offset relative to first bucket, per series") {
    val df = Seq(("a", 100L), ("a", 110L), ("b", 200L), ("b", 230L))
      .toDF("host", "bucket")
    val out = TimesQuery.withTimeOffset(df, Seq("host"))
      .orderBy("host", "bucket")
      .select("host", "time_offset").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 0L), ("a", 10L), ("b", 0L), ("b", 30L)))
    val single = TimesQuery.withTimeOffset(Seq(5L, 9L).toDF("bucket"))
      .orderBy("bucket").select("time_offset").as[Long].collect().toSeq
    assert(single == Seq(0L, 4L))
  }

  // ── REST list sort/pagination (server.py:604-638) ───────────────────

  test("list sort + pagination with validation") {
    import graft.api.Listing
    val df = Seq("c", "a", "d", "b").map(Tuple1(_)).toDF("name")
    assert(Listing.sortPage(df, "name:1", 0, 2)
      .as[String].collect().toSeq == Seq("a", "b"))
    assert(Listing.sortPage(df, "name:-1", 1, 2)
      .as[String].collect().toSeq == Seq("b", "a"))
    assertThrows[IllegalArgumentException](Listing.sortPage(df, perPage = 101))
    assertThrows[IllegalArgumentException](Listing.sortPage(df, perPage = 0))
    assertThrows[IllegalArgumentException](Listing.sortPage(df, page = -1))
    assertThrows[IllegalArgumentException](Listing.sortPage(df, sort = "a:b:c"))
  }

  // ── CSV source (membucket.py:90-112, nl.csv.gz-style) ───────────────

  test("semicolon CSV(.gz) loads and runs a times-query (golden)") {
    val dir = java.nio.file.Files.createTempDirectory("csv")
    val csv = dir.resolve("nl.csv")
    // nl.csv shape: DT;Temperature;CO2 (membucket.py:90-112)
    java.nio.file.Files.writeString(csv,
      """DT;Temperature;CO2
        |2024-01-01 00:10:00;20.0;400
        |2024-01-01 00:20:00;22.0;410
        |2024-01-01 01:10:00;24.0;420
        |2024-01-01 02:30:00;;430
        |""".stripMargin)
    val raw = Tables.loadCsv(spark, csv.toString)
      .withColumn("ts", to_timestamp(col("DT")))
    val out = TimesQuery.run(spark, raw, "ts", 3600L,
      1704067200L, 1704067200L + 4 * 3600L,
      Seq(Feature("avg_temp", "avg", "Temperature"),
        Feature("n_co2", "count", "CO2")))
      .collect()
    assert(out.length == 4)
    val byBucket: Map[Long, (Option[Any], Double)] = out.map { r =>
      (r.getLong(0) - 1704067200L) / 3600L ->
        ((Option(r.get(r.fieldIndex("avg_temp"))),
          r.getDouble(r.fieldIndex("n_co2"))))
    }.toMap
    assert(byBucket(0L) == (Some(21.0), 2.0)) // (20+22)/2, two CO2 points
    assert(byBucket(1L) == (Some(24.0), 1.0))
    assert(byBucket(2L) == (None, 1.0))       // empty Temperature cell → null
    assert(byBucket(3L) == (None, 0.0))       // empty bucket: count 0, avg null
  }

  test("Tables.load absorbs pandas re-typing drift: int32 ids, float64 " +
      "embeddings, int n_chars all land at the canonical types") {
    val dir = java.nio.file.Files.createTempDirectory("drift")
    // documents with int32 doc_id / int32 n_chars
    Seq((1, "alpha beta", "en", "s0", 10))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id").cast("int"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("int"))
      .write.parquet(s"$dir/documents.parquet")
    // embeddings with float64 vectors and int64 label
    Seq((1, Array(0.25, 0.5), 3))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id").cast("int"),
        col("embedding").cast("array<double>"), col("label").cast("long"))
      .write.parquet(s"$dir/embeddings.parquet")
    val d = Tables.load(spark, dir.toString, "documents")
    assert(d.schema("doc_id").dataType.typeName == "long")
    assert(d.schema("n_chars").dataType.typeName == "long")
    val e = Tables.load(spark, dir.toString, "embeddings")
    assert(e.schema("vec_id").dataType.typeName == "long")
    assert(e.schema("embedding").dataType.simpleString == "array<float>")
    assert(e.schema("label").dataType.typeName == "integer")
    // values survive the widening exactly
    assert(d.select("doc_id").as[Long].head() == 1L)
    assert(e.select(element_at(col("embedding"), 1)).as[Float].head() == 0.25f)
  }

  test("Tables.load absorbs TPC-H drift: re-typed keys/prices and a " +
      "nanos-as-long shipdate all land at the canonical layout") {
    val dir = java.nio.file.Files.createTempDirectory("drift_tpch")
    // lineitem with int32 keys, float32 prices, and l_shipdate written
    // as int64 NANOS (the events.ts r7 hazard, on the date column)
    val nanos = 1704067200L * 1000000000L
    Seq((7, 3, 2, 1L, 4.0f, 100.5f, 0.1f, 0.02f, "N", "O", nanos))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .select(col("l_orderkey").cast("int"), col("l_partkey").cast("int"),
        col("l_suppkey").cast("int"), col("l_linenumber").cast("long"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
      .write.parquet(s"$dir/lineitem.parquet")
    val li = Tables.load(spark, dir.toString, "lineitem")
    assert(li.schema("l_orderkey").dataType.typeName == "long")
    assert(li.schema("l_linenumber").dataType.typeName == "integer")
    assert(li.schema("l_quantity").dataType.typeName == "double")
    assert(li.schema("l_shipdate").dataType.typeName == "timestamp")
    val r = li.select(col("l_orderkey"), col("l_quantity"),
      unix_micros(col("l_shipdate"))).head()
    assert(r.getLong(0) == 7L)
    assert(r.getDouble(1) == 4.0)
    assert(r.getLong(2) == 1704067200L * 1000000L)
  }
}
