package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Temporal, TextAnalysis}

/** Unit coverage for the retrieval/corpus-statistics wave: BM25 ranked
  * retrieval, PMI collocations, the Zipf rank-frequency fit, Theil–Sen
  * robust trend, and per-key autocorrelation. Expected values are
  * recomputed in-test with the operators' documented formulas (same
  * operand order), so these pin semantics, not snapshots. */
class RetrievalStatsSpec extends SparkSpec {
  import spark.implicits._

  // ── BM25 ─────────────────────────────────────────────────────────────

  private def bm25Term(tf: Long, df: Long, n: Long, dl: Long,
      avgdl: Double): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      (tf * 2.5) / (tf + 1.5 * (1.0 - 0.75 + 0.75 * dl / avgdl))

  test("bm25TopK: formula, distinct-query-term contract, no-match docs absent") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b b"))
      .toDF("doc_id", "text")
    // query has 'a' twice: scores once (distinct contract)
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq(1 -> "a b a", 2 -> "c"), k = 10)
      .collect().map(r => ((r.getInt(0), r.getLong(2)),
        (r.getInt(1), r.getDouble(3)))).toMap
    val avgdl = 3.0 // (3 + 2 + 4) / 3
    val exp1 = Map( // query 1 = {a, b}; df(a)=2, df(b)=2, N=3
      1L -> (bm25Term(2, 2, 3, 3, avgdl) + bm25Term(1, 2, 3, 3, avgdl)),
      2L -> bm25Term(1, 2, 3, 2, avgdl),
      3L -> bm25Term(4, 2, 3, 4, avgdl))
    for ((id, s) <- exp1)
      assert(math.abs(out((1, id))._2 - s) < 1e-9, s"doc $id")
    // query 2 = {c}: only doc 2 contains it — docs 1,3 must be ABSENT
    assert(!out.contains((2, 1L)) && !out.contains((2, 3L)))
    assert(math.abs(out((2, 2L))._2 -
      bm25Term(1, 1, 3, 2, avgdl)) < 1e-9)
    // ranks: q1 ordering is score desc (doc1 has both terms and short dl)
    val ranks = out.collect { case ((1, id), (rk, _)) => id -> rk }
    assert(ranks.toMap.values.toSet === Set(1, 2, 3))
  }

  test("bm25TopK: identical docs tie-break by id asc; k caps output") {
    val docs = Seq((10L, "x y"), (2L, "x y"), (7L, "x y"), (5L, "z"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq(1 -> "x"), k = 2)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, 2L), (2, 7L))) // equal scores → id asc, k=2
  }

  // ── PMI ──────────────────────────────────────────────────────────────

  test("pmiCollocations: Church-Hanks score on known counts; minCount gate") {
    // 5× "x y" docs + one lone "x": c1(x)=6, c1(y)=5, T1=11;
    // bigram "x y" c2=5, T2=5
    val docs = (Seq.fill(5)("x y") :+ "x").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", k = 10,
      minCount = 1).collect()
    assert(out.length === 1)
    val exp = math.log((5.0 * 11.0 * 11.0) / (5.0 * 6.0 * 5.0))
    assert(out.head.getString(0) === "x y")
    assert(out.head.getLong(1) === 5L)
    assert(math.abs(out.head.getDouble(2) - exp) < 1e-6)
    // minCount = 6 filters the pair out entirely
    assert(TextAnalysis.pmiCollocations(docs, "text", 10, minCount = 6)
      .count() === 0L)
  }

  // ── Zipf ─────────────────────────────────────────────────────────────

  test("zipfFit: two-point log-log fit is exact; rank ties break term-asc") {
    // counts 8 and 2 → slope = (ln2 - ln8)/(ln2 - ln1) = -2 ⇒ alpha = 2
    val docs = Seq((1L, (Seq.fill(8)("aa") ++ Seq.fill(2)("bb"))
      .mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs, "text").collect().head
    assert(r.getLong(0) === 2L)
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-6)            // alpha
    assert(math.abs(r.getDouble(2) - math.log(8.0)) < 1e-6)  // intercept
  }

  test("zipfFit: vocabulary past maxTerms fail-fasts instead of " +
      "funneling the dictionary through one sort partition") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.zipfFit(docs, "text", maxTerms = 5)
    }
    assert(e.getMessage.contains("maxTerms"))
    // at the bound it runs
    assert(TextAnalysis.zipfFit(docs, "text", maxTerms = 6)
      .collect().head.getLong(0) === 6L)
  }

  // ── Theil–Sen ────────────────────────────────────────────────────────

  test("theilSen: one wild outlier cannot move the median slope") {
    // y = 2t on t=0..4 except y(4)=100: 6 of 10 pairwise slopes are
    // exactly 2 → median 2 (OLS would report ~20)
    val pts = Seq((0L, 0.0), (1L, 2.0), (2L, 4.0), (3L, 6.0),
      (4L, 100.0)).map { case (t, v) => ("s", t, v) }
      .toDF("k", "t", "v")
    val r = Temporal.theilSen(pts, Seq("k"), "t", "v").collect().head
    assert(r.getLong(1) === 10L)                 // n_pairs = C(5,2)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12)
    // keyed independence: a second key with slope -1 coexists
    val two = pts.union(Seq(("z", 0L, 5.0), ("z", 1L, 4.0), ("z", 2L, 3.0))
      .toDF("k", "t", "v"))
    val m = Temporal.theilSen(two, Seq("k"), "t", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(m("s") - 2.0) < 1e-12)
    assert(math.abs(m("z") - (-1.0)) < 1e-12)
  }

  // ── ACF ──────────────────────────────────────────────────────────────

  test("acf: alternating series gives the textbook ±(n-l)/n ladder") {
    // y = (-1)^t on t=0..7: mean 0, Σy² = 8; acf(l) = Σ y_t·y_{t+l} / 8
    // = (8-l)/8 with sign (-1)^l
    val pts = (0L to 7L).map(t =>
      ("s", t, if (t % 2 == 0) 1.0 else -1.0)).toDF("k", "t", "v")
    val out = Temporal.acf(pts, Seq("k"), "t", "v", maxLag = 3, step = 1L)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1) === ((7L, -7.0 / 8)))
    assert(out(2) === ((6L, 6.0 / 8)))
    assert(out(3) === ((5L, -5.0 / 8)))
  }

  test("acf: missing buckets pair only where both endpoints exist") {
    val pts = Seq(("s", 0L, 1.0), ("s", 1L, 2.0), ("s", 3L, 4.0))
      .toDF("k", "t", "v")
    val out = Temporal.acf(pts, Seq("k"), "t", "v", maxLag = 2, step = 1L)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out(1) === 1L) // only (0,1); (3) has no t=2 partner
    assert(out(2) === 1L) // only (1,3)
    assert(!out.contains(3))
  }

  test("bm25TopKIndexed ≡ bm25TopK bit-for-bit through the persisted " +
      "index (the index is a pure cost move)") {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0L until 40L).map(i => (i,
      Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val qs = Seq(1 -> "aa cc", 2 -> "ee bb")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_idx").toString
    Retrieval.buildIndex(docs, "doc_id", "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val direct = rows(Retrieval.bm25TopK(docs, "doc_id", "text", qs, 40))
    val indexed = rows(
      Retrieval.bm25TopKIndexed(spark, dir, "doc_id", qs, 40))
    assert(direct === indexed) // EXACT doubles, not approximate
    // a second query batch probes the same index without a rebuild
    val q2 = rows(Retrieval.bm25TopKIndexed(spark, dir, "doc_id",
      Seq(7 -> "dd"), 40))
    assert(q2.nonEmpty && q2.forall(_._1 == 7))
  }

  test("updateIndex: base ⊕ delta probes bit-equal to a full rebuild; " +
      "postings append (delta-sized write); update needs a completed " +
      "index") {
    val rnd = new scala.util.Random(53)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val all = (0L until 50L).map(i => (i,
      Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val base = all.filter(col("doc_id") % 5 =!= 0)
    val delta = all.filter(col("doc_id") % 5 === 0)
    val qs = Seq(1 -> "aa cc", 2 -> "ee bb dd")
    val incrDir = java.nio.file.Files
      .createTempDirectory("graft_bm25_incr").toString
    val fullDir = java.nio.file.Files
      .createTempDirectory("graft_bm25_full").toString
    // update refuses an incomplete index (no marker yet)
    intercept[IllegalArgumentException] {
      Retrieval.updateIndex(delta, "doc_id", "text", incrDir)
    }
    Retrieval.buildIndex(base, "doc_id", "text", incrDir)
    val baseFiles = new java.io.File(s"$incrDir/postings")
      .listFiles().count(_.getName.endsWith(".parquet"))
    Retrieval.updateIndex(delta, "doc_id", "text", incrDir)
    Retrieval.buildIndex(all, "doc_id", "text", fullDir)
    def rows(dir: String) =
      Retrieval.bm25TopKIndexed(spark, dir, "doc_id", qs, 50)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    assert(rows(incrDir) === rows(fullDir)) // EXACT doubles
    // stats merged from exact longs — identical to the rebuild's row
    assert(Retrieval.indexStats(spark, incrDir).collect().toSeq ===
      Retrieval.indexStats(spark, fullDir).collect().toSeq)
    // the base postings files were APPENDED to, not rewritten: the
    // delta-sized cost claim is structural, not incidental
    val afterFiles = new java.io.File(s"$incrDir/postings")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(afterFiles > baseFiles,
      s"expected appended postings files ($baseFiles -> $afterFiles)")
  }

  // ── randomized ≡-brute-force (seeded, the house confidence pattern) ──

  test("bm25TopK ≡ brute-force reference scorer on a random corpus") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val corpus = (0L until 60L).map(i =>
      i -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    val docs = corpus.map { case (i, ts) => (i, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val qs = Seq(1 -> "aa cc", 2 -> "gg", 3 -> "bb ee ff")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 60)
      .collect().map(r => (r.getInt(0), r.getLong(2)) ->
        (r.getInt(1), r.getDouble(3))).toMap
    // brute force, straight from the scaladoc formula
    val n = corpus.size
    val avgdl = corpus.map(_._2.size).sum.toDouble / n
    val dfm = vocab.map(t =>
      t -> corpus.count(_._2.contains(t)).toLong).toMap
    def w(tf: Long, df: Long, dl: Int): Double =
      math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        (tf * 2.5) / (tf + 1.5 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    for ((qid, qt) <- qs; (id, toks) <- corpus) {
      val terms = qt.split(" ").distinct.filter(t => toks.contains(t))
      val exp = terms.map(t =>
        w(toks.count(_ == t).toLong, dfm(t), toks.size)).sum
      if (terms.isEmpty) assert(!got.contains((qid, id)), s"$qid/$id")
      else assert(math.abs(got((qid, id))._2 - exp) < 1e-9, s"$qid/$id")
    }
    // ranks: per query, scores non-increasing with rank
    for (q <- qs.map(_._1)) {
      val byRank = got.collect { case ((`q`, _), (rk, s)) => rk -> s }
        .toSeq.sortBy(_._1)
      assert(byRank.zip(byRank.tail).forall { case ((_, a), (_, b)) =>
        a >= b - 1e-12 })
    }
  }

  test("theilSen ≡ brute-force pairwise-slope median on random series") {
    val rnd = new scala.util.Random(23)
    val pts = (0 until 40).map(i =>
      ("k", i.toLong * 7, rnd.nextDouble() * 100 - 50))
    val got = Temporal.theilSen(pts.toDF("g", "t", "v"), Seq("g"), "t", "v")
      .collect().head
    val slopes = (for {
      i <- pts.indices; j <- pts.indices if j > i
    } yield (pts(j)._3 - pts(i)._3) / (pts(j)._2 - pts(i)._2).toDouble)
      .sorted
    val m = slopes.size
    val exp = // Spark percentile(0.5): index (m-1)/2 interpolated
      if (m % 2 == 1) slopes(m / 2)
      else slopes(m / 2 - 1) * 0.5 + slopes(m / 2) * 0.5
    assert(got.getLong(1) === m.toLong)
    assert(math.abs(got.getDouble(2) - exp) < 1e-9)
  }

  test("acf ≡ brute-force autocorrelation on a random series") {
    val rnd = new scala.util.Random(31)
    val ys = Vector.fill(50)(rnd.nextDouble() * 10)
    val pts = ys.zipWithIndex.map { case (y, t) => ("k", t.toLong, y) }
    val got = Temporal.acf(pts.toDF("g", "t", "v"), Seq("g"), "t", "v",
        maxLag = 5, step = 1L)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    val mean = ys.sum / ys.size
    val d = ys.map(_ - mean)
    val ss = d.map(x => x * x).sum
    for (l <- 1 to 5) {
      val num = (0 until ys.size - l).map(i => d(i) * d(i + l)).sum
      assert(math.abs(got(l) - num / ss) < 1e-9, s"lag $l")
    }
  }

  // ── cluster metrics ──────────────────────────────────────────────────

  test("clusterMetrics: hand-computed scatter + simplified silhouette; " +
      "rejects a single label") {
    import graft.operators.Similarity
    // label 0 at x∈{0,2}, label 1 at x∈{10,12} → centroids x=1 and x=11;
    // every point: a=1; b∈{9,11} → s ∈ {8/9, 10/11}, mean per label equal
    val df = Seq((1L, Array(0f, 0f), 0), (2L, Array(2f, 0f), 0),
      (3L, Array(10f, 0f), 1), (4L, Array(12f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterMetrics(df, "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val expSil = (8.0 / 9 + 10.0 / 11) / 2
    for (l <- Seq(0, 1)) {
      assert(out(l)._1 === 2L)
      assert(math.abs(out(l)._2 - 1.0) < 1e-9, s"scatter $l")
      assert(math.abs(out(l)._3 - expSil) < 1e-9, s"sil $l")
    }
    val one = df.filter(col("label") === 0)
    intercept[IllegalArgumentException] {
      Similarity.clusterMetrics(one, "embedding", "label").collect()
    }
  }

  // ── plan shapes ──────────────────────────────────────────────────────

  test("bm25TopK plan: query set broadcast — the corpus side never " +
      "shuffles on anything query-dependent") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val p = Retrieval.bm25TopK(docs, "doc_id", "text", Seq(1 -> "a"), 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
