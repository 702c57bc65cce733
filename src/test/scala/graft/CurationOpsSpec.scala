package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{Dedup, SemiStructured, Temporal, TextAnalysis}

/** Unit coverage for the round-8 curation additions: JSON extraction and
  * JSONL round-trip, the Gopher rule battery, cluster-representative
  * selection, and additive seasonal decomposition. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── SemiStructured ───────────────────────────────────────────────────

  private val kSchema = StructType(Seq(StructField("k", LongType),
    StructField("tag", StringType)))

  test("extract: typed fields from JSON; corrupt/missing land as null") {
    val df = Seq(
      (1L, """{"k": 7, "tag": "x"}"""),
      (2L, """{"k": -3}"""),          // missing field -> null tag
      (3L, """not json at all"""),    // corrupt -> both null
      (4L, null.asInstanceOf[String]) // null payload -> both null
    ).toDF("id", "props")
    val out = SemiStructured.extract(df, "props", kSchema)
      .select("id", "k", "tag").collect().map(r =>
        (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out === Set(
      (1L, Some(7L), Some("x")),
      (2L, Some(-3L), None),
      (3L, None, None),
      (4L, None, None)))
  }

  test("extract refuses a schema field that would shadow an existing column") {
    val df = Seq((1L, """{"id": 9}""")).toDF("id", "props")
    val e = intercept[IllegalArgumentException] {
      SemiStructured.extract(df, "props",
        StructType(Seq(StructField("id", LongType))))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("jsonlRoundtrip: quotes, backslashes, newlines, unicode survive") {
    val nasty = Seq(
      (1L, "en", """plain text"""),
      (2L, "de", "with \"quotes\" and \\backslash\\"),
      (3L, "fr", "line1\nline2\ttabbed"),
      (4L, "ja", "ユニコード 🎉 text"),
      (5L, "en", "")
    ).toDF("doc_id", "lang", "text")
    val rt = SemiStructured.jsonlRoundtrip(nasty, Seq("doc_id", "lang", "text"))
    val bad = rt.filter(col("text_rt") =!= col("text") ||
      col("lang_rt") =!= col("lang") || col("doc_id_rt") =!= col("doc_id"))
    assert(bad.count() === 0)
    // the serialized line is genuine JSONL: one line per row... except
    // embedded newlines are escaped, so EVERY jsonl value is single-line
    val lines = rt.select("jsonl").as[String].collect()
    assert(lines.forall(l => !l.contains("\n")))
  }

  test("extract + gopherRules are stateless narrow maps: streaming " +
      "output ≡ batch output on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, """{"k": 5, "tag": "a"}""", "the quick brown fox and the dog"),
      (2L, """broken""", "- bullet\n- bullet"),
      (3L, """{"k": -1}""", (1 to 60).map(i => s"w$i").mkString(" ")))
    def shape(df: org.apache.spark.sql.DataFrame) =
      SemiStructured.extract(df, "props", kSchema)
        .withColumn("keep", TextAnalysis.gopherRules(col("text"))("r_stopwords"))
        .withColumn("norm", graft.functions.NormalizeText(
          TextAnalysis.htmlExtract(concat(lit("<p> "), col("text"),
            lit(" \t</p><script>x()</script>")))))
        .select("id", "k", "tag", "keep", "norm")
    val batch = shape(rows.toDF("id", "props", "text"))
      .collect().map(_.toSeq).toSet
    val ms = MemoryStream[(Long, String, String)]
    val q = shape(ms.toDF().toDF("id", "props", "text"))
      .writeStream.format("memory").queryName("cur_par").outputMode("append")
      .start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("cur_par").collect().map(_.toSeq).toSet
      assert(stream === batch)
    } finally q.stop()
  }

  // ── Gopher rules ─────────────────────────────────────────────────────

  private def rules(text: String): Map[String, Boolean] = {
    val r = TextAnalysis.gopherRules(col("text"))
    val names = Seq("r_wordcount", "r_meanwordlen", "r_symbol", "r_bullet",
      "r_ellipsis", "r_alpha", "r_stopwords")
    val row = Seq(text).toDF("text")
      .select(names.map(n => r.getField(n).as(n)): _*).head()
    names.zipWithIndex.map { case (n, i) => n -> row.getBoolean(i) }.toMap
  }

  private val fiftyGoodWords =
    (1 to 48).map(i => s"word$i").mkString(" ") + " the and"

  test("gopher: a normal 50-word doc with stopwords passes every rule") {
    assert(rules(fiftyGoodWords).forall(_._2))
  }

  test("gopher: word-count bounds") {
    assert(!rules("too few words the and")("r_wordcount"))
    assert(rules(fiftyGoodWords)("r_wordcount"))
  }

  test("gopher: mean word length out of [3,10] fails") {
    val shorty = (1 to 60).map(_ => "a b").mkString(" ") // mean len 1
    assert(!rules(shorty)("r_meanwordlen"))
    val lengthy = (1 to 50).map(_ => "supercalifragilistic").mkString(" ")
    assert(!rules(lengthy)("r_meanwordlen"))
  }

  test("gopher: symbol ratio (# and ...) >= 0.1 fails") {
    val hashy = fiftyGoodWords + " " + (1 to 10).map(_ => "#").mkString(" ")
    assert(!rules(hashy)("r_symbol"))
  }

  test("gopher: bullet and ellipsis line fractions") {
    val bullets = (1 to 10).map(i => s"- item$i the and").mkString("\n")
    assert(!rules(bullets)("r_bullet"))
    val ellipses = (1 to 10).map(i => s"line$i trails off...").mkString("\n")
    assert(!rules(ellipses)("r_ellipsis"))
    assert(rules(fiftyGoodWords)("r_bullet"))
    assert(rules(fiftyGoodWords)("r_ellipsis"))
  }

  test("domainQualityFilter: low-mean source dropped wholesale, mean is " +
      "exact-integer-deterministic, per-doc quality matches qualityScore") {
    // srcA: two high-quality docs; srcB: high + terrible (mean drags
    // below threshold → BOTH dropped, including the good doc — the
    // domain-granularity semantic)
    val good = (1 to 50).map(i => s"word$i").mkString(" ")
    val junk = "!!!;;;... ,,, ." // punctuation soup, near-zero quality
    val df = Seq(
      (1L, "srcA", good), (2L, "srcA", good + " extra tail words here"),
      (3L, "srcB", good), (4L, "srcB", junk))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis
      .domainQualityFilter(df, "doc_id", "source", "text", minMean = 0.7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "srcA"), (2L, "srcA")))
    // the surviving mean equals the exact integer arithmetic replay
    val q = df.filter(col("source") === "srcA")
      .select(round(TextAnalysis.qualityScore(col("text")) + lit(1e-9), 4))
      .collect().map(_.getDouble(0))
    val expMean = math.round(
      q.map(x => math.round(x * 1e4)).sum.toDouble / q.length / 1e4 * 1e6
        + 1e-9 * 1e6).toDouble / 1e6
    val gotMean = TextAnalysis
      .domainQualityFilter(df, "doc_id", "source", "text", minMean = 0.7)
      .select("src_mean_quality").head().getDouble(0)
    assert(math.abs(gotMean - expMean) < 1e-12)
  }

  test("gopher: alpha-word fraction counts digit-only words against") {
    val numeric = (1 to 30).map(i => s"$i ${i * 7}").mkString(" ")
    assert(!rules(numeric)("r_alpha"))
  }

  test("gopher: needs >= 2 distinct stopwords") {
    val oneStop = (1 to 50).map(i => s"word$i").mkString(" ") + " the"
    assert(!oneStop.isEmpty && !rules(oneStop)("r_stopwords"))
    assert(rules(fiftyGoodWords)("r_stopwords"))
  }

  // ── selectRepresentatives ────────────────────────────────────────────

  test("selectRepresentatives keeps the best-ordered member per cluster") {
    val docs = Seq(
      (1L, "short", 0.3), (2L, "the better longer doc", 0.9),
      (3L, "middle", 0.5), (4L, "lone", 0.7)
    ).toDF("doc_id", "text", "q")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val out = Dedup.selectRepresentatives(docs, clusters, "doc_id",
        Seq(col("q").desc, col("doc_id")))
      .select("cluster_id", "doc_id", "cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L, 3L), (4L, 4L, 1L)))
  }

  test("selectRepresentatives tie-break on the unique column is total") {
    val docs = Seq((1L, 0.5), (2L, 0.5), (3L, 0.5)).toDF("doc_id", "q")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id")
    val kept = Dedup.selectRepresentatives(docs, clusters, "doc_id",
      Seq(col("q").desc, col("doc_id"))).select("doc_id").as[Long].collect()
    assert(kept.toSeq === Seq(1L))
  }

  // ── seasonalDecompose ────────────────────────────────────────────────

  test("seasonalDecompose recovers a constructed trend+seasonal signal") {
    // v(b) = 100 (flat trend) + s(b mod 4), s = (+2, -1, +3, -4) -> mean 0
    val period = 4
    val s = Array(2.0, -1.0, 3.0, -4.0)
    val rows = (0L until 40L).map(b => ("k", b, 100.0 + s((b % 4).toInt)))
    val df = rows.toDF("key", "bucket", "v")
    val out = Temporal.seasonalDecompose(df, Seq("key"), "bucket", "v", period)
      .select("bucket", "trend", "seasonal", "resid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]),
        r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    val h = period / 2
    out.foreach { case (b, trend, seasonal, resid) =>
      if (b < h || b >= 40 - h) {
        assert(trend.isEmpty, s"edge bucket $b must have null trend")
        assert(resid.isEmpty)
      } else {
        // centered window of 5 over period-4 signal double-counts the
        // window's first/last slot: trend = 100 + s((b-h)%4)/5 exactly
        val expected = 100.0 + s(((b - h) % 4).toInt) / 5.0
        assert(math.abs(trend.get - expected) < 1e-9, s"bucket $b")
      }
      // seasonal indices are centered: each equals s adjusted by the
      // slot-mean of the trend wiggle; they must sum to ~0 per period
      assert(seasonal.abs < 5.0)
    }
    val perPeriod = out.filter(_._1 < 4).map(_._3).sum
    assert(math.abs(perPeriod) < 1e-6, "seasonal indices must sum to ~0")
  }

  test("seasonalDecompose: constant series gives zero seasonal and resid") {
    val df = (0L until 24L).map(b => ("k", b, 5.0)).toDF("key", "bucket", "v")
    val out = Temporal.seasonalDecompose(df, Seq("key"), "bucket", "v", 6)
      .filter(col("trend").isNotNull)
    assert(out.count() > 0)
    val bad = out.filter(abs(col("trend") - 5.0) > 1e-12 ||
      abs(col("seasonal")) > 1e-12 || abs(col("resid")) > 1e-12)
    assert(bad.count() === 0)
  }
}
