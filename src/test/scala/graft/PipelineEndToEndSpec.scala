package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, PipelineRunner, PipelineStage,
  Sampling, TextAnalysis}

/** End-to-end composition of the training-data pipeline on real
  * sf0.001 parquet: redact → keep-one line dedup → boilerplate drop →
  * LSH near-dup dedup → quality/LM filter → token-budget mix → pack.
  * Each stage's COLUMN CONTRACT must chain into the next — this is the
  * test that catches a renamed output column or a dropped id, which the
  * per-operator specs cannot see.
  */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("full pipeline composes on sf0.001 with invariants at each stage") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val n0 = docs.count()
    assert(n0 > 0)

    // 1. PII scrub: row-preserving
    val scrubbed = docs.withColumn("text",
      TextAnalysis.redactPii(col("text")))
    assert(scrubbed.count() == n0)

    // 2. keep-one line dedup (token unit): row-preserving, token mass
    //    can only shrink
    val tok = (c: String) => sum(TextAnalysis.tokenCount(col(c)))
    val tokens0 = scrubbed.agg(tok("text")).as[Long].head()
    val once = Dedup.dedupLines(scrubbed, "doc_id", "text",
      sepRegex = " ", joinSep = " ")
    assert(once.count() == n0)
    val tokens1 = once.agg(tok("cleaned")).as[Long].head()
    assert(tokens1 <= tokens0)

    // 3. boilerplate drop on the deduped text: row-preserving
    val trimmed = Dedup.removeBoilerplate(
        once.withColumnRenamed("cleaned", "text"), "doc_id", "text",
        minDocs = 400, sepRegex = " ", joinSep = " ")
      .withColumnRenamed("cleaned", "text")
    assert(trimmed.count() == n0)

    // 4. near-dup dedup runs on the ORIGINAL text (cleaning may erase
    //    the distinguishing tokens); survivors are a subset of docs
    val survivors = Dedup.lshDedup(docs, "doc_id", "text",
      numHashes = 8, bands = 4, tau = 0.5)
    val nDedup = survivors.count()
    assert(nDedup <= n0 && nDedup > 0)

    // 5. LM quality filter on survivors: keep docs below the 90th
    //    percentile of bits/token (drop rare-token noise)
    val lm = TextAnalysis.unigramLm(survivors, "text")
    val scored = TextAnalysis.lmBitsPerToken(survivors, "doc_id", "text", lm)
    val cut = scored.stat.approxQuantile("bits_per_token", Array(0.9), 0.01)(0)
    val kept = scored.filter(col("bits_per_token") <= cut)
      .join(survivors, "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= nDedup)

    // 6. token-budget mix over sources: kept token mass per budgeted
    //    stratum is <= budget + one doc's tokens (rate guarantee)
    val budgets = (0 until 20).map(k => s"src$k" -> 200L).toMap
    val mixed = Sampling.tokenBudgetSample(kept, "source", "doc_id",
      TextAnalysis.tokenCount(col("text")), budgets)
    assert(mixed.count() <= nKept)

    // 7. pack the final mix: manifest covers every mixed doc exactly
    //    once, offsets contiguous, sequences reassemble
    val man = Packing.packManifest(mixed, "doc_id", "text", seqLen = 64)
    assert(man.count() == mixed.count())
    val totalTok = man.agg(sum("n_tokens")).as[Long].head()
    val seqs = Packing.packSequences(mixed, "doc_id", "text", seqLen = 64)
    val gathered = seqs.agg(sum("n_tokens")).as[Long].head()
    assert(gathered == totalTok, "packed sequences must conserve tokens")
    val full = seqs.filter(col("seq_id") < totalTok / 64)
    assert(full.filter(col("n_tokens") =!= 64).count() == 0,
      "every non-final sequence holds exactly seqLen tokens")
  }

  test("ingest-to-release composes: extract → normalize → domain gate → " +
      "keep-maximal containment → scorer eval → sharded publish+verify") {
    val raw = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val n0 = raw.count()
    // 0. pretend the crawl delivered HTML: wrap, then extract+normalize
    //    must round-trip the visible text byte-for-byte
    val textual = raw.withColumn("extracted",
      graft.functions.NormalizeText(graft.operators.TextAnalysis
        .htmlExtract(concat(lit("<html><body><p>"), col("text"),
          lit("</p><script>x()</script></body></html>")))))
    assert(textual.filter(col("extracted") =!= col("text")).count() === 0L)

    // 1. domain-granularity gate: survivors' sources all meet the bar,
    //    and membership is all-or-nothing per source
    val gated = graft.operators.TextAnalysis.domainQualityFilter(
      textual, "doc_id", "source", "text", minMean = 0.5)
    val perSrc = gated.groupBy("source").count()
      .join(textual.groupBy("source").count()
        .withColumnRenamed("count", "total"), "source")
    assert(perSrc.filter(col("count") =!= col("total")).count() === 0L,
      "a gated source must keep ALL its docs")

    // 2. keep-maximal containment on the gated corpus (the gate returns
    //    id+quality columns — join the text back in, the composition
    //    contract this spec exists to check)
    val maximal = graft.operators.Dedup.dropContained(
      gated.select("doc_id")
        .join(textual.select("doc_id", "text"), "doc_id"),
      "doc_id", "text", tau = 0.8)
    val nMax = maximal.count()
    assert(nMax > 0 && nMax <= gated.count())

    // 3. scorer sanity on the release set: AUC well-defined, bins cover
    val scored = maximal.select(
      round(graft.operators.TextAnalysis.qualityScore(col("text")), 4)
        .as("score"),
      (length(col("text")) >= lit(300)).as("y"))
    val auc = graft.functions.Stats.rocAuc(scored, "score", "y").head()
    assert(!auc.isNullAt(2) && auc.getDouble(2) >= 0.0 &&
      auc.getDouble(2) <= 1.0)

    // 4. publish + integrity check round-trips clean
    val dir = java.nio.file.Files
      .createTempDirectory("graft_e2e_release").toString
    graft.io.Publish.writeShards(maximal, "doc_id", "text", dir, shards = 4)
    assert(graft.io.Publish.verifyShards(spark, dir, "doc_id", "text")
      .count() === 0L)
    // release manifest accounts for every surviving doc
    val m = spark.read.parquet(s"$dir/manifest")
    assert(m.agg(sum("n_docs")).head().getLong(0) === nMax)
  }

  test("audit loop composes: skew check → retrieval probe → slice drift " +
      "→ batch-vs-reference PSI → cluster health") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val embs = graft.sources.Tables.load(spark, sf, "embeddings")

    // 0. before any corpus-keyed join ships: the skew report answers
    //    "is any source a straggler?" — the synthetic corpus is
    //    near-uniform, so no source should weigh multiple mean keys
    val skew = graft.operators.Skew.skewReport(docs, Seq("source"), 5)
      .collect()
    assert(skew.nonEmpty && skew.forall(_.getLong(3) <= 2L),
      "uniform corpus must not suggest salting")

    // 1. retrieval probe: every BM25 hit must actually contain at
    //    least one query term (the join-structure invariant)
    val hits = graft.operators.Retrieval.bm25TopK(
      docs, "doc_id", "text", Seq(1 -> "hash join"), k = 5)
    val bad = hits.join(docs, "doc_id")
      .filter(!col("text").contains("hash") && !col("text").contains("join"))
    assert(hits.count() === 5L && bad.count() === 0L)

    // 2. slice drift: n_chars per source vs rest — KS must be
    //    symmetric-bounded [0,1] and PSI finite for every source
    val ks = graft.operators.Drift.ksDrift(docs, "source", "n_chars")
      .collect()
    assert(ks.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    val psi = graft.operators.Drift.psi(docs, "source", "n_chars")
      .collect()
    assert(psi.forall(r => !r.getDouble(2).isNaN &&
      !r.getDouble(2).isInfinite))

    // 3. batch PSI against a frozen reference ≡ the streaming monitor's
    //    arithmetic (psiStream runs on a batch frame): same rows, same
    //    bins → the release gate and the live monitor CANNOT disagree
    val lo = 0.0
    val hi = docs.agg(max(col("n_chars"))).head().getLong(0).toDouble
    val ref = graft.operators.Drift.binFractions(docs, "n_chars", lo, hi, 10)
    val windowed = graft.streaming.StreamingDrift.psiStream(
      docs.withColumn("ts", timestamp_seconds(lit(0L))),
      Nil, "ts", "n_chars", windowSec = 60, latenessSec = 0,
      lo, hi, 10, ref).collect()
    assert(windowed.length === 1)
    // whole corpus vs its own reference: only smoothing-denominator
    // slack remains — drift must read as negligible
    assert(math.abs(windowed.head.getDouble(2)) < 1e-3)

    // 4. embedding cluster health: silhouette defined for every label
    val health = graft.operators.Similarity.clusterMetrics(
      embs, "embedding", "label").collect()
    assert(health.length >= 2 && health.forall(r =>
      !r.getDouble(3).isNaN && r.getDouble(3) >= -1.0 &&
        r.getDouble(3) <= 1.0))
  }

  test("PipelineRunner: a killed stage resumes from the last green " +
      "stage — the prefix is never recomputed, the result matches an " +
      "unstaged run, manifests cover every stage") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pipe_resume").toString
    val calls = Array.fill(3)(
      new java.util.concurrent.atomic.AtomicInteger)
    @volatile var bomb = true
    def stages = Seq(
      PipelineStage("gate", df => { calls(0).incrementAndGet()
        df.filter(col("n_chars") >= 100) }),
      PipelineStage("dedup", df => { calls(1).incrementAndGet()
        Dedup.exact(df, "text", "doc_id") }),
      PipelineStage("sample", df => { calls(2).incrementAndGet()
        if (bomb) throw new RuntimeException("killed at hour 30")
        Sampling.hashSample(df, "doc_id", 0.5) }))
    intercept[RuntimeException] {
      PipelineRunner.run(docs, stages, dir, "doc_id", "text")
    }
    assert(calls.map(_.get).toSeq == Seq(1, 1, 1))
    bomb = false
    val out = PipelineRunner.run(docs, stages, dir, "doc_id", "text")
    // stages 0-1 were green: skipped; only the killed stage re-ran
    assert(calls.map(_.get).toSeq == Seq(1, 1, 2))
    // staged ≡ unstaged composition of the same chain
    val expect = Sampling.hashSample(
        Dedup.exact(docs.filter(col("n_chars") >= 100), "text", "doc_id"),
        "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === expect)
    // one manifest per stage, every stage present
    val man = PipelineRunner.manifests(spark, dir, stages)
    assert(man.select("stage").distinct().count() === 3L)
    // a fully-green rerun recomputes NOTHING and serves the artifact
    val again = PipelineRunner.run(docs, stages, dir, "doc_id", "text")
    assert(calls.map(_.get).toSeq == Seq(1, 1, 2))
    assert(again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === expect)
  }

  test("PipelineRunner: a CHANGED input invalidates the whole green " +
      "prefix (no silent reuse of stale stage outputs); the same input " +
      "still resumes; zero completed stages -> empty manifests") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pipe_fprint").toString
    val calls = Array.fill(2)(
      new java.util.concurrent.atomic.AtomicInteger)
    def stages = Seq(
      PipelineStage("gate", df => { calls(0).incrementAndGet()
        df.filter(col("n_chars") >= 100) }),
      PipelineStage("dedup", df => { calls(1).incrementAndGet()
        Dedup.exact(df, "text", "doc_id") }))
    // zero completed stages: an empty audit trail, not a throw
    val none = PipelineRunner.manifests(spark, dir, stages)
    assert(none.count() === 0L)
    assert(none.columns.toSeq ===
      Seq("stage", "shard", "n_docs", "n_chars", "checksum"))
    PipelineRunner.run(docs, stages, dir, "doc_id", "text")
    assert(calls.map(_.get).toSeq == Seq(1, 1))
    // same input, fully green: nothing recomputes
    PipelineRunner.run(docs, stages, dir, "doc_id", "text")
    assert(calls.map(_.get).toSeq == Seq(1, 1))
    // DIFFERENT input (one doc dropped): every stage must rerun — the
    // green markers describe the old corpus. Before the fingerprint,
    // this silently served stage outputs computed from `docs`.
    val changed = docs.filter(col("doc_id") =!= 0L)
    val out = PipelineRunner.run(changed, stages, dir, "doc_id", "text")
    assert(calls.map(_.get).toSeq == Seq(2, 2))
    val expect = Dedup.exact(changed.filter(col("n_chars") >= 100),
        "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === expect)
    assert(!expect.contains(0L))
    // and the changed input is now the recorded one: rerun = no-op
    PipelineRunner.run(changed, stages, dir, "doc_id", "text")
    assert(calls.map(_.get).toSeq == Seq(2, 2))
  }
}
