package graft

import org.apache.spark.sql.functions._

import graft.ml.TextClassifier
import graft.operators.{Retrieval, Sampling, Similarity}

/** Unit coverage for the curation wave: RRF hybrid fusion, the trained
  * Elliott-sigmoid quality classifier, temperature mixture sampling,
  * and diversity-preserving per-cell subsampling. Expected values are
  * recomputed in-test with the operators' documented formulas (same
  * operand order), so these pin semantics, not snapshots. */
class CurationWaveSpec extends SparkSpec {
  import spark.implicits._

  // ── rrfFuse ──────────────────────────────────────────────────────────

  test("rrfFuse: score formula, absent-list contribution 0, tie order") {
    val sparse = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 20L, 1), (1L, 40L, 2))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(sparse, dense), k = 10)
      .collect().map(r => r.getLong(2) ->
        (r.getInt(1), r.getDouble(3), r.getInt(4), r.getInt(5))).toMap
    // doc 20 is in both lists: 1/(60+2) + 1/(60+1)
    assert(out(20L)._2 === 1.0 / 62 + 1.0 / 61)
    assert(out(20L)._3 === 2 && out(20L)._4 === 1)
    // doc 10 sparse-only, doc 40 dense-only: single term + 0.0
    assert(out(10L)._2 === 1.0 / 61 + 0.0)
    assert(out(10L)._4 === 0) // absent from dense
    assert(out(40L)._2 === 0.0 + 1.0 / 62)
    assert(out(40L)._3 === 0) // absent from sparse
    // fused order: 20 (two terms) first, then 10 and 40 — 10 and 40
    // tie EXACTLY only if 1/61 == 1/62 (they don't): 10 outranks 40
    assert(out(20L)._1 === 1 && out(10L)._1 === 2 && out(40L)._1 === 3)
  }

  test("rrfFuse: duplicate (query, doc) rows in one list collapse to " +
      "the best rank, and score derives from that same rank") {
    val a = Seq((1L, 10L, 3), (1L, 10L, 1), (1L, 20L, 2))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a), k = 10)
      .collect().map(r => r.getLong(2) -> (r.getDouble(3), r.getInt(4)))
      .toMap
    assert(out(10L) === ((1.0 / 61, 1))) // min rank wins BOTH fields
    assert(out(20L) === ((1.0 / 62, 2)))
  }

  test("rrfFuse: equal-rank-set ties break by doc_id asc") {
    val a = Seq((1L, 5L, 1), (1L, 3L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 3L, 1), (1L, 5L, 2)).toDF("query_id", "doc_id", "rank")
    // both docs score 1/61 + 1/62 — the tie resolves to the lower id
    val out = Retrieval.rrfFuse(Seq(a, b), k = 2)
      .orderBy("rank").collect()
    assert(out(0).getLong(2) === 3L && out(1).getLong(2) === 5L)
    assert(out(0).getDouble(3) === out(1).getDouble(3))
  }

  // ── TextClassifier ───────────────────────────────────────────────────

  private val labeled = Seq(
    // "good" docs: long, stopword-rich, spaced — label 1
    (1L, "the quick brown fox jumps over the lazy dog and runs to the hills in a bright morning", 1.0),
    (2L, "a tale of two cities is a novel and it is set in london and paris during the revolution", 1.0),
    (3L, "the history of science is full of wonder and the joy of discovery is open to all of us", 1.0),
    // "bad" docs: short / punct-heavy / digit-heavy — label 0
    (4L, "x!!!;;;...", 0.0),
    (5L, "1234567890 000111", 0.0),
    (6L, "??!!..;;::", 0.0)).toDF("doc_id", "text", "label")

  test("fit: loss direction — separable toy corpus classifies correctly after training") {
    val m = TextClassifier.fit(labeled, "text", col("label"),
      iters = 40, lr = 1.0)
    val scored = labeled.select(col("doc_id"), col("label"),
        TextClassifier.score(col("text"), m.weights).as("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    for ((id, y, p) <- scored)
      assert((p > 0.5) === (y > 0.5), s"doc $id: p=$p y=$y")
    // trajectory bookkeeping: zero init, iters+1 snapshots
    assert(m.trajectory.head.forall(_ == 0.0))
    assert(m.trajectory.size === 41 && m.iters === 40)
  }

  test("fit: weight trajectory is bit-identical across partitionings (decimal-routed gradient)") {
    val a = TextClassifier.fit(labeled.repartition(1), "text",
      col("label"), iters = 7)
    val b = TextClassifier.fit(labeled.repartition(5), "text",
      col("label"), iters = 7)
    for (t <- a.trajectory.indices)
      assert(a.trajectory(t).toSeq === b.trajectory(t).toSeq, s"step $t")
  }

  test("fit: one hand-folded GD step matches (formula pin)") {
    // two docs, all-zero init: p = 0.5, r = 0.5 - y; features exact
    val df = Seq((1L, "the the", 1.0), (2L, "zz", 0.0))
      .toDF("doc_id", "text", "label")
    val m = TextClassifier.fit(df, "text", col("label"),
      iters = 1, lr = 0.5)
    // f(doc1): toks=2 f1=2/50; punct=0 f2=0; chars=7,spaces=1 ⇒
    //   avgTok=(7-1)/2=3 f3=3/8; digits=0 f4=0; stops=2 f5=1
    // f(doc2): toks=1 f1=1/50; f2=0; chars=2,spaces=0 avgTok=2 f3=2/8;
    //   f4=0; f5=0
    val g = Array(
      0.0, // r1·1 + r2·1 = -0.5 + 0.5
      -0.5 * (2.0 / 50) + 0.5 * (1.0 / 50),
      0.0,
      -0.5 * (3.0 / 8) + 0.5 * (2.0 / 8),
      0.0,
      -0.5 * 1.0 + 0.5 * 0.0)
    val exp = g.map(gj => -0.5 * gj / 2.0)
    assert(m.weights.toSeq === exp.toSeq)
  }

  // ── temperatureMix ───────────────────────────────────────────────────

  test("temperatureMix: α=0.5 rates — rare stratum upweighted √-proportionally") {
    // stratum A: 400 tokens over 4 docs; B: 4 tokens over 4 docs
    val df = (1 to 4).map(i => (i.toLong, "A", 100L)) ++
      (5 to 8).map(i => (i.toLong, "B", 1L))
    val in = df.toDF("id", "s", "n")
    val out = Sampling.temperatureMix(in, "s", "id", col("n"),
      budget = 100L)
    // expected rates: √400=20, √4=2, Z=22 ⇒
    //   A: 100·(20/22)/400 ≈ 0.227 ⇒ 0 or 1 epochs per doc
    //   B: 100·(2/22)/4 ≈ 2.27 ⇒ 2 or 3 epochs per doc
    val byStratum = out.groupBy("s").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every B doc repeats ≥2: count ≥ 8; A contributes ≤ 4 rows
    assert(byStratum.getOrElse("B", 0L) >= 8L)
    assert(byStratum.getOrElse("A", 0L) <= 4L)
    // weighted: B's per-doc rate exceeds A's though B is 100× smaller
    val epochsB = out.filter(col("s") === "B").groupBy("id")
      .agg(max("epoch")).collect().map(_.getInt(1))
    assert(epochsB.forall(e => e == 2 || e == 3))
  }

  test("temperatureMix: deterministic across partitionings") {
    val df = (1 to 50).map(i =>
      (i.toLong, if (i % 10 == 0) "rare" else "base", (i % 7 + 1).toLong))
    val a = Sampling.temperatureMix(df.toDF("id", "s", "n")
        .repartition(1), "s", "id", col("n"), budget = 60L)
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1)))
      .sorted.toSeq
    val b = Sampling.temperatureMix(df.toDF("id", "s", "n")
        .repartition(7), "s", "id", col("n"), budget = 60L)
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1)))
      .sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  // ── diversitySample ──────────────────────────────────────────────────

  test("diversitySample: per-cell quota enforced, deterministic, zero-norm kept in cell -1") {
    // two well-separated centroids; 10 points near each; 1 zero vector
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows =
      (1 to 10).map(i => (i.toLong, Seq(1.0f, 0.01f * i))) ++
      (11 to 20).map(i => (i.toLong, Seq(0.01f * (i - 10), 1.0f))) ++
      Seq((21L, Seq(0.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.diversitySample(df, "vec_id", "embedding",
      cents, quota = 3)
    val byCell = out.groupBy("cell").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell(0L) === 3L && byCell(1L) === 3L)
    assert(byCell(-1L) === 1L) // zero-norm row survives outside quotas
    assert(out.filter(col("cell") >= 0 && col("pos") > 3).count() === 0L)
    val again = Similarity.diversitySample(df.repartition(5), "vec_id",
      "embedding", cents, quota = 3)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again ===
      out.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("diversitySample: hot-cell guard — a 90%-one-cell corpus never " +
      "ranks a corpus-sized window partition, kept set unchanged") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // the boilerplate-cluster shape: 9000 rows collapse into cell 0,
    // 1000 into cell 1 (argmax bounds cell COUNT, not population)
    val rows = (1 to 10000).map { i =>
      if (i <= 9000) (i.toLong, Seq(1.0f, 0.0001f * (i % 50)))
      else (i.toLong, Seq(0.0001f * (i % 50 + 1), 1.0f))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(8)
    val out = Similarity.diversitySample(df, "vec_id", "embedding",
      cents, quota = 3)
    val byCell = out.groupBy("cell").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell(0L) === 3L && byCell(1L) === 3L)
    // kept set identical to the unguarded draw: the 3 smallest
    // (hashUniform, id) per cell, recomputed brute-force per cell
    def expect(ids: Seq[Long]): Seq[Long] =
      ids.toDF("vec_id")
        .select(col("vec_id"), Sampling.hashUniform(col("vec_id"), "").as("u"))
        .orderBy(col("u").asc, col("vec_id").asc).limit(3)
        .collect().map(_.getLong(0)).sorted.toSeq
    val kept0 = out.filter(col("cell") === 0L).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val kept1 = out.filter(col("cell") === 1L).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept0 === expect((1L to 9000L)))
    assert(kept1 === expect((9001L to 10000L)))
    // the guard is in the PLAN, not just the math: below the
    // row_number window sits the margin·quota/count pre-filter (the
    // optimizer merges it into the broadcast-count join's condition),
    // so the hot cell's window partition sees ~margin·quota survivors
    // (E=24 of 9000 here), never its full population
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wnode = out.queryExecution.optimizedPlan
      .collectFirst { case w: LWindow => w }
    assert(wnode.nonEmpty, "expected a Window node")
    val guarded = wnode.get.child.collect {
      case n if n.expressions.exists(_.toString.contains("__cn")) => n }
    assert(guarded.nonEmpty,
      "row_number window must sit above the per-cell-count pre-filter")
    // and the survivor population the guard admits is two orders
    // below the hot cell's size (binomial mean margin·quota = 24)
    val thr = 8.0 * 3 / 9000
    val survivors = (1L to 9000L).toDF("vec_id")
      .filter(Sampling.hashUniform(col("vec_id"), "") < lit(thr)).count()
    assert(survivors >= 3 && survivors < 200, s"survivors=$survivors")
  }

  // ── mmrRerank ────────────────────────────────────────────────────────

  test("mmrRerank: first pick = max rel; near-duplicate of the pick is demoted; formula pin") {
    // docs 1 and 2 are near-identical vectors; doc 3 orthogonal-ish.
    // rel: 1 > 2 > 3. Pure relevance keeps 2 second; MMR must not.
    val cand = Seq(
      (1L, 1L, 0.90, Seq(1.0, 0.0)),
      (1L, 2L, 0.89, Seq(1.0, 0.001)),
      (1L, 3L, 0.50, Seq(0.0, 1.0)))
      .toDF("query_id", "doc_id", "rel", "v")
    val out = Similarity.mmrRerank(cand, k = 3, lambda = 0.7)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((1, 1L, 0.7 * 0.90 - (1.0 - 0.7) * 0.0)))
    // step 2: doc 2's sim-to-selected ≈ 1 crushes its mmr; doc 3 wins
    assert(out(1)._2 === 3L)
    assert(out(2)._2 === 2L)
    // formula pin for step 2: cos(v3, v1) = 0 exactly
    assert(out(1)._3 === 0.7 * 0.50 - (1.0 - 0.7) * 0.0)
  }

  test("mmrRerank: deterministic across partitionings, stops when candidates exhaust") {
    val cand = (1 to 9).map(i => (i.toLong % 3, i.toLong,
      1.0 / i, Seq(math.cos(i.toDouble), math.sin(i.toDouble))))
      .toDF("query_id", "doc_id", "rel", "v")
    val a = Similarity.mmrRerank(cand.repartition(1), k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val b = Similarity.mmrRerank(cand.repartition(7), k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(a === b)
    // 3 candidates per query, k=5: exactly 3 picks per query
    assert(a.groupBy(_._1).forall(_._2.size == 3))
  }

  // ── cellOutliers ─────────────────────────────────────────────────────

  test("cellOutliers: winning-cell cosine, bottom-m order, cap") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // cell 0 members at increasing angles from the centroid
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.2f)), (3L, Seq(1.0f, 0.4f)),
      (4L, Seq(1.0f, 0.6f)), (10L, Seq(0.0f, 1.0f)))
    val out = Similarity.cellOutliers(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // cell 0: most atypical = largest angle = ids 4 then 3; cap at 2
    assert(out.filter(_._1 == 0L).sortBy(_._3).map(_._2).toSeq ===
      Seq(4L, 3L))
    assert(out.filter(_._1 == 1L).map(_._2).toSeq === Seq(10L))
  }

  // ── dedupReport / ngramNovelty ───────────────────────────────────────

  test("dedupReport: counts, ratio, worst-copy pin") {
    import graft.operators.Dedup
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "z")).toDF("source", "text")
    val out = Dedup.dedupReport(df, "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("a") === ((4L, 2L, 3L, 2.0 / 4.0)))
    assert(out("b") === ((1L, 1L, 1L, 0.0)))
  }

  test("ngramNovelty: exact ratios, ref docs score 0, short docs null") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a b c d", true),    // ref: grams {a b c, b c d}
      (2L, "a b c x y", false), // grams: a b c (seen), b c x, c x y → 2/3
      (3L, "a b", false))       // < 3 tokens → null
      .toDF("doc_id", "text", "is_ref")
    val out = TextAnalysis.ngramNovelty(df, "doc_id", "text",
      col("is_ref"), n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L) === ((2L, 0L, Some(0.0))))
    assert(out(2L) === ((3L, 2L, Some(2.0 / 3.0))))
    assert(out(3L) === ((0L, 0L, None)))
  }

  test("samplers refuse a row-unique strata column: the per-stratum " +
      "driver collect is capped and fails loudly past 100k strata") {
    import graft.operators.Sampling
    // one stratum per row — the misuse the guard exists for
    val df = spark.range(100001L)
      .select(col("id"), col("id").cast("string").as("cls"),
        lit(10L).as("n_tok"))
    val e = intercept[IllegalArgumentException] {
      Sampling.balanceClasses(df, "cls", "id")
    }
    assert(e.getMessage.contains("low-cardinality"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSample(df, "cls", "id", col("n_tok"),
        Map("0" -> 5L))
    }
    assert(e2.getMessage.contains("tokenBudgetSample"))
    // and a legitimate metadata-sized strata column still works
    val ok = Sampling.tokenBudgetSample(
      df.withColumn("cls", (col("id") % 3).cast("string")),
      "cls", "id", col("n_tok"), Map("0" -> 1000L, "1" -> 1000L, "2" -> 1000L))
    assert(ok.count() > 0)
  }
}
