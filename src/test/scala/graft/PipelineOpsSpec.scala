package graft

import org.apache.spark.sql.functions._

import graft.ml.{SeasonalModel, SeasonalModelParams}
import graft.operators.{Dedup, Multimodal, Packing, Sampling, Similarity, TextAnalysis}

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── Dedup ──────────────────────────────────────────────────────

  test("exact dedup keeps smallest id per identical text") {
    val df = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "cc")).toDF("id", "text")
    val out = Dedup.exact(df, "text", "id").select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("wordShingles: n-gram construction + short-text guard") {
    val df = Seq(("a b c d", 1), ("a b", 2)).toDF("text", "id")
    val sh = df.select(col("id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(sh(1) == Seq("a b c", "b c d"))
    assert(sh(2).isEmpty) // no descending-sequence surprise
  }

  test("minhash: identical docs get identical signatures, disjoint don't") {
    val df = Seq(
      (1L, "x y z w v u"), (2L, "x y z w v u"), (3L, "p q r s t o"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(df, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("simhash: identical docs equal; near docs closer than far docs") {
    val df = Seq(
      (1L, "spark query engine fast scan join"),
      (2L, "spark query engine fast scan join"),
      (3L, "spark query engine fast scan merge"),
      (4L, "zz yy xx ww vv uu"))
      .toDF("doc_id", "text")
    val sh = Dedup.simHash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("ngram jaccard: identical docs = 1.0") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "f g h i j"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0))) // 3 shares nothing → no pair
  }

  test("ngram jaccard skew guard caps shingle OCCURRENCES (pre-distinct)") {
    // "a b c" occurs 3× in total (twice in doc 1, once in doc 2) but in
    // only 2 distinct docs: the occurrence cap at 2 drops it (the guard
    // counts the raw explode so pass 1 needs no distinct shuffle), so
    // docs 1 and 2 — who share nothing else — form no pair
    val df = Seq((1L, "a b c a b c"), (2L, "a b c x y z"), (3L, "q r s t"))
      .toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text",
      maxPerShingle = 2).count() == 0)
    // at cap 3 the shingle survives and the pair appears
    val p = Dedup.ngramJaccardPairs(df, "doc_id", "text", maxPerShingle = 3)
      .select("id_a", "id_b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p.toSeq == Seq((1L, 2L, 1L)))
  }

  test("ngram jaccard candidate budget: triggers on a clone-dense corpus, " +
      "silent when candidates fit, disabled at <= 0") {
    // 40 identical docs, 3 distinct shingles each occurring 40× →
    // post-cap candidate estimate = 3·C(40,2) = 2340
    val clones = (1L to 40L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val ex = intercept[IllegalStateException] {
      Dedup.ngramJaccardPairs(clones, "doc_id", "text",
        maxCandidatePairs = 1000)
    }
    assert(ex.getMessage.contains("lshVerifiedPairs"))
    assert(ex.getMessage.contains("2340"))
    // same corpus under a budget that fits — runs to completion
    assert(Dedup.ngramJaccardPairs(clones, "doc_id", "text",
      maxCandidatePairs = 2340).count() == 40L * 39 / 2)
    // <= 0 disables the guard entirely
    assert(Dedup.ngramJaccardPairs(clones, "doc_id", "text",
      maxCandidatePairs = 0).count() == 40L * 39 / 2)
    // over-cap shingles don't count toward the estimate (they never
    // reach the pair stage): every shingle over the occurrence cap →
    // estimate 0 → silent even at budget 1
    assert(Dedup.ngramJaccardPairs(clones, "doc_id", "text",
      maxPerShingle = 10, maxCandidatePairs = 1).count() == 0)
  }

  test("native WordShingles ≡ the composed slice/zip_with form, " +
      "including empty tokens and short-text guard") {
    // the composed reference implementation it replaced
    def composed(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(text, " ")
      val cnt = greatest(size(toks) - (n - 1), lit(0))
      val slices = (0 until n).map(i => slice(toks, lit(i + 1), cnt))
      val zipped = slices.reduce((a, b) =>
        zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
      when(size(toks) < n, array().cast("array<string>")).otherwise(zipped)
    }
    val rnd = new scala.util.Random(5)
    val words = Array("a", "bb", "ccc", "", "dd", "é☃") // incl. empty + unicode
    val texts = Seq.fill(300)(
      Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.length))).mkString(" ")) ++
      Seq("", " ", "a  b", "one two three four")
    for (n <- Seq(1, 2, 3)) {
      val df = texts.toDF("t")
      val bad = df.filter(!(graft.operators.Dedup.wordShingles(col("t"), n) <=>
        composed(col("t"), n))).count()
      assert(bad == 0, s"n=$n mismatch")
    }
  }

  test("native MinHashSigs / SimHash64 ≡ the explode→groupBy forms they " +
      "replaced, including no-shingle docs and SQL-surface registration") {
    // the explode/groupBy reference implementations the narrow per-row
    // kernels replaced — kept here as the differential oracle
    def minhashRef(df: org.apache.spark.sql.DataFrame, h: Int, n: Int) = {
      val exploded = df.select(col("doc_id"),
        explode(Dedup.wordShingles(col("text"), n)).as("sh"))
      val aggs = (0 until h).map(i =>
        min(Dedup.hash60(concat(lit(i.toString), lit(":"), col("sh"))))
          .as(s"sig_$i"))
      exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    }
    def simhashRef(df: org.apache.spark.sql.DataFrame) = {
      val toks = df.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", Dedup.hash60(col("tok")))
      val votes = (0 until 60).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"v$b"))
      val voted = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      val sig = (0 until 60)
        .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      voted.select(col("doc_id"), sig.as("simhash"))
    }
    val rnd = new scala.util.Random(11)
    val words = Array("alpha", "bb", "c", "", "δδ", "ee", "ff", "gg")
    val texts = Seq.tabulate(300)(i => (i.toLong,
      Seq.fill(rnd.nextInt(9))(words(rnd.nextInt(words.length)))
        .mkString(" "))) ++
      Seq((900L, ""), (901L, " "), (902L, "one two"), (903L, "one two three"))
    val df = texts.toDF("doc_id", "text")
    for (h <- Seq(4, 8); n <- Seq(2, 3)) {
      val got = Dedup.minHashSignatures(df, "doc_id", "text", h, n)
      val exp = minhashRef(df, h, n)
      // same doc set (shingle-less docs dropped by both), same sig values
      assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0,
        s"minhash mismatch at h=$h n=$n")
    }
    val gotS = Dedup.simHash(df, "doc_id", "text")
    val expS = simhashRef(df)
    assert(gotS.exceptAll(expS).count() == 0 && expS.exceptAll(gotS).count() == 0)
    // SQL surface
    val sqlSig = spark.sql(
      "SELECT graft_minhash('a b c d', 3, 2) AS s, graft_simhash('a b') AS h")
      .collect()(0)
    assert(sqlSig.getSeq[Long](0).length == 2 && !sqlSig.isNullAt(1))
    assert(spark.sql("SELECT graft_minhash('a b', 3, 2) AS s")
      .collect()(0).isNullAt(0)) // < n tokens → null signature
  }

  test("NormalizeText: NFC composition, NBSP/control handling, collapse/trim, " +
      "idempotence, nulls, SQL-surface registration") {
    import graft.functions.NormalizeText
    val in = Seq(
      "Cafe\u0301 du Parc",          // decomposed -> composed
      "Café du Parc",           // already NFC: unchanged
      "a\u0007b",                    // dropped control joins the chars
      "a \u0007 b",                  // dropped control inside a ws run
      "a\u000B\u000C\rb",            // ws-class controls collapse
      "x\u007Fy",                    // DEL dropped
      "\t  hi\u00A0\u00A0world  \n", // NBSP + edge ws
      " \t \r\n \u0007 ",            // nothing survives
      "",
      null)
    val got = in.toDF("t").select(NormalizeText(col("t")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(
      Some("Café du Parc"), Some("Café du Parc"), Some("ab"),
      Some("a b"), Some("a b"), Some("xy"), Some("hi world"),
      Some(""), Some(""), None))
    // idempotent: a normalized string is a fixed point
    val twice = in.toDF("t")
      .select(NormalizeText(NormalizeText(col("t"))).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(twice.toSeq === got.toSeq)
    // SQL surface through the extension
    Seq("Cafe\u0301\t x").toDF("t").createOrReplaceTempView("norm_t")
    assert(spark.sql("SELECT graft_normalize(t) FROM norm_t")
      .head().getString(0) === "Café x")
  }

  test("htmlExtract: script/style/comment strip, tag strip, entity decode " +
      "incl. no-rescan, whitespace collapse, nulls") {
    import graft.operators.TextAnalysis
    val in = Seq(
      "<p>Hello <b>world</b></p>",
      // script body with stray < > and a fake closing tag inside a string
      "<script type=\"x\">if (a<b && c>d) s='</scr'+'ipt>';</script>after",
      "<style>p{a:b}</style><STYLE media=\"x\">q{c:d}</STYLE >kept",
      "a<!-- multi\nline -->b",
      // entity decode order: &amp; last, never rescanned
      "x &amp;lt; y &amp;amp; z",
      "1 &lt; 2 &gt; 0 &quot;q&quot; &#39;s&#39;&nbsp;end",
      "  <div \n class='x'>\t spaced \n</div>  ",
      "<unclosed attr=1",   // no '>' -> stays literal
      "",
      null)
    val got = in.toDF("h")
      .select(TextAnalysis.htmlExtract(col("h")).as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(
      Some("Hello world"),
      Some("after"),
      Some("kept"),
      Some("a b"),
      Some("x &lt; y &amp; z"),
      Some("1 < 2 > 0 \"q\" 's' end"),
      Some("spaced"),
      Some("<unclosed attr=1"),
      Some(""),
      None))
  }

  test("containmentJoin ≡ brute-force directional containment; quote case " +
      "invisible to jaccard; clones both ways; sub-shingle docs excluded") {
    import graft.operators.Dedup
    val page = (1 to 60).map(i => s"w$i").mkString(" ") // 58 shingles
    val quote = (21 to 30).map(i => s"w$i").mkString(" ") // 8 shingles ⊂ page
    val partial = (1 to 6).map(i => s"w$i").mkString(" ") + " zz qq" // some overlap
    val corpus = Seq(
      (1L, page), (2L, quote), (3L, partial),
      (4L, "alpha beta"),          // < 3 tokens: no shingles, never pairs
      (5L, quote), (6L, quote),    // clone group with 2
      (7L, "x1 x2 x3 x4"))         // unrelated
      .toDF("doc_id", "text")
    val tau = 0.8
    val got = Dedup.containmentJoin(corpus, "doc_id", "text", tau)
      .select("id_a", "id_b", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // brute force over the same shingle sets
    val sets = corpus.select(col("doc_id"),
        array_distinct(Dedup.wordShingles(col("text"), 3)).as("s"))
      .filter(size(col("s")) > 0)
    val brute = sets.as("a").join(sets.as("b"),
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(col("a.s"))).as("c"))
      .filter(col("c") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === brute)
    // the quote is contained in the page…
    assert(got.contains((2L, 1L, 1.0)))
    // …directionally: the page is NOT contained in the quote
    assert(!got.exists(p => p._1 == 1L && p._2 == 2L))
    // and jaccard at the same τ misses the pair entirely
    val jac = Dedup.jaccardJoin(corpus, "doc_id", "text", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)) && !jac.contains((2L, 1L)))
    // clone group {2,5,6}: all 6 ordered pairs at 1.0
    val cloneIds = Set(2L, 5L, 6L)
    val clonePairs = got.filter(p => cloneIds(p._1) && cloneIds(p._2))
    assert(clonePairs.size === 6 && clonePairs.forall(_._3 === 1.0))
    // cache-release contract is asserted in IncrementalOpsSpec's
    // repeated-call leak test (checkpoint blocks drain via GC there)

    // keep-maximal filter over the same corpus: the quote (2) and its
    // clones (5, 6) all collapse into the strictly-larger page (1);
    // sub-shingle doc 4 and the sub-τ / unrelated 3, 7 survive
    val kept = Dedup.dropContained(corpus, "doc_id", "text", tau)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 7L))
    // without the page, the clone group keeps exactly its smallest id
    val keptNoPage = Dedup.dropContained(
        corpus.filter(col("doc_id") =!= 1L), "doc_id", "text", tau)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptNoPage === Set(2L, 3L, 4L, 7L))
  }

  test("manifest: partitioning/order-invariant checksum, any content " +
      "change flips it, shards cover and counts add up") {
    import graft.operators.CorpusStats
    val docsDf = (1L to 200L).map(i => (i, s"doc body $i " * 3))
      .toDF("doc_id", "text")
    val m1 = CorpusStats.manifest(docsDf, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // same rows, different order and partitioning → identical manifest
    val m2 = CorpusStats.manifest(
        docsDf.orderBy(col("doc_id").desc).repartition(7), "doc_id",
        "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(m1 === m2)
    assert(m1.map(_._1) === (0L to 7L).toSet)
    assert(m1.toSeq.map(_._2).sum === 200L)
    // flip ONE character of ONE doc: exactly that shard's checksum moves
    val tampered = docsDf.withColumn("text",
      when(col("doc_id") === 57L, concat(col("text"), lit("x")))
        .otherwise(col("text")))
    val m3 = CorpusStats.manifest(tampered, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val base = m1.map(r => (r._1, r._4)).toMap
    assert(m3.count { case (s, c) => base(s) != c } === 1)
  }

  test("Publish.writeShards/verifyShards: round-trip verifies clean; a " +
      "deleted shard reports missing; a tampered shard reports corrupt") {
    import graft.io.Publish
    val dir = java.nio.file.Files
      .createTempDirectory("graft_publish").toString
    val docsDf = (1L to 120L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    Publish.writeShards(docsDf, "doc_id", "text", dir, shards = 4)
    assert(Publish.verifyShards(spark, dir, "doc_id", "text").count() === 0L)
    // tamper: drop one shard's rows and rewrite the data (manifest kept)
    val kept = spark.read.parquet(s"$dir/data")
      .filter(col("shard") =!= 2)
    kept.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$dir/data2")
    // point verification at the tampered layout via a copied manifest
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_publish2").toString
    spark.read.parquet(s"$dir/manifest").write.parquet(s"$dir2/manifest")
    kept.write.partitionBy("shard").parquet(s"$dir2/data")
    val bad = Publish.verifyShards(spark, dir2, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(bad === Map(2L -> "missing"))
  }

  test("Publish.verifyShards: the modulus comes from the layout " +
      "artifact, so empty top-numbered shards (tiny corpus, many " +
      "shards) verify clean instead of spuriously corrupt") {
    import graft.io.Publish
    val dir = java.nio.file.Files
      .createTempDirectory("graft_publish_small").toString
    // 3 docs into 16 shards: the highest-numbered shards are empty, so
    // max(stored shard)+1 would infer a smaller modulus and reassign
    // every doc
    val tiny = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    Publish.writeShards(tiny, "doc_id", "text", dir, shards = 64)
    assert(spark.read.parquet(s"$dir/manifest").agg(max(col("shard")))
      .head().getLong(0) < 63L) // the premise: top shards really empty
    assert(Publish.verifyShards(spark, dir, "doc_id", "text")
      .count() === 0L)
  }

  test("JaroWinkler: textbook pairs, floored half-transpositions " +
      "(the DuckDB convention), boost threshold, empties, nulls, SQL " +
      "surface") {
    import graft.functions.{JaroWinkler, JaroWinklerKernel}
    def k(a: String, b: String) = JaroWinklerKernel.jwStr(a, b)
    assert(math.abs(k("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(k("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(k("dwayne", "duane") - 0.84) < 1e-12)
    // floored half-transpositions: 'cbe'/'aecdbbdddc' has 3 mismatched
    // matches -> t = 1 (not 1.5) -> 0.6555…, the DuckDB/rapidfuzz value
    assert(math.abs(k("cbe", "aecdbbdddc") - (1.0/3) * (1.0 + 0.3 + 2.0/3))
      < 1e-12)
    // boost only above 0.7: crate/trace sits at 0.7333 with NO prefix
    assert(math.abs(k("crate", "trace") - 0.7333333333333333) < 1e-12)
    assert(k("", "") === 0.0 && k("a", "") === 0.0) // DuckDB's convention
    assert(k("abc", "abc") === 1.0 && k("ab", "ba") === 0.0)
    val r = Seq(("martha", "marhta"), (null, "x"))
      .toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b"))).collect()
    assert(math.abs(r(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(r(1).isNullAt(0))
    assert(math.abs(spark.sql(
      "SELECT graft_jaro_winkler('jellyfish', 'smellyfish')")
      .head().getDouble(0) - 0.8962962962962964) < 1e-12)
  }

  test("editDistanceJoin ≡ brute-force levenshtein join; short-string band sound; multiset grams honest") {
    // mixed corpus: near pairs, a far pair, repeated-gram strings, and
    // short strings below the prefix-filter soundness bound
    val rows = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fx"),   // d=1
      (3L, "the quick brown cat"),                               // d=3 of 1
      (4L, "completely different!"),
      (5L, "aaaaaaaa"), (6L, "aaaaabaa"),                        // d=1, gram multiset
      (7L, "ab"), (8L, "b"), (9L, "abcd"),                       // shorts
      (10L, "zzzz")
    ).toDF("id", "s")
    val d = 3
    val got = graft.operators.Dedup.editDistanceJoin(rows, "id", "s", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = rows.as("a").join(rows.as("b"),
        col("a.id") < col("b.id") &&
          levenshtein(col("a.s"), col("b.s")) <= d)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute, s"got ${got.toSeq.sorted} vs ${brute.toSeq.sorted}")
    // the short pairs (7,8) d=1 and (7,9) d=2 must be present — they are
    // reachable ONLY through the catch-all length-band tokens
    assert(got.contains((7L, 8L, 1)) && got.contains((7L, 9L, 2)))
  }

  test("editDistanceJoin property: random mutated corpora ≡ brute force (filter completeness under ins/del/sub)") {
    val rnd = new scala.util.Random(17)
    val alpha = "abcde"
    def mutate(s: String, ops: Int): String = {
      var cur = s
      for (_ <- 0 until ops) {
        val i = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.take(i) + cur.drop(i + 1)  // del
          case 1 => cur.take(i) + alpha(rnd.nextInt(5)) + cur.drop(i) // ins
          case _ if cur.nonEmpty =>
            cur.take(i) + alpha(rnd.nextInt(5)) + cur.drop(i + 1)  // sub
          case _ => cur + alpha(rnd.nextInt(5))
        }
      }
      cur
    }
    for (trial <- 1 to 6) {
      val seeds = (0 until 8).map(_ =>
        (0 until (4 + rnd.nextInt(16))).map(_ => alpha(rnd.nextInt(5))).mkString)
      val corpus = seeds.zipWithIndex.flatMap { case (s, i) =>
        Seq((i * 10L, s), (i * 10L + 1, mutate(s, rnd.nextInt(4))))
      }
      val df = corpus.toDF("id", "s")
      val d = 2
      val got = graft.operators.Dedup.editDistanceJoin(df, "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = df.as("a").join(df.as("b"),
          col("a.id") < col("b.id") &&
            levenshtein(col("a.s"), col("b.s")) <= d)
        .select(col("a.id"), col("b.id"), levenshtein(col("a.s"), col("b.s")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === brute,
        s"trial $trial: corpus=$corpus got=${got.toSeq.sorted} brute=${brute.toSeq.sorted}")
    }
  }

  test("containmentJoin property: random subset/superset corpora ≡ brute " +
      "force at several τ (prefix+size+positional filter completeness)") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(41)
    val vocab = (1 to 40).map(i => s"t$i")
    for (trial <- 1 to 4) {
      // base docs + random contiguous quotes of them + noise docs; word
      // sampling with replacement makes duplicate tokens / clone texts
      val bases = (0 until 5).map(_ =>
        (0 until (8 + rnd.nextInt(20))).map(_ =>
          vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val corpus = bases.zipWithIndex.flatMap { case (s, i) =>
        val w = s.split(" ")
        val from = rnd.nextInt(math.max(1, w.length - 4))
        val quote = w.slice(from, from + 4 + rnd.nextInt(w.length)).mkString(" ")
        Seq((i * 10L, s), (i * 10L + 1, quote),
          (i * 10L + 2, if (rnd.nextBoolean()) s else quote)) // clones
      }
      val df = corpus.toDF("id", "s")
      val tau = Seq(0.5, 0.8, 1.0)(trial % 3)
      val got = Dedup.containmentJoin(df, "id", "s", tau)
        .select(col("id_a"), col("id_b"), round(col("containment"), 9))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val sets = df.select(col("id"),
          array_distinct(Dedup.wordShingles(col("s"), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
      val brute = sets.as("a").join(sets.as("b"),
          col("a.id") =!= col("b.id"))
        .select(col("a.id"), col("b.id"),
          round(size(array_intersect(col("a.sh"), col("b.sh")))
            .cast("double") / size(col("a.sh")), 9).as("c"))
        .filter(col("c") >= tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got === brute, s"trial $trial tau=$tau corpus=$corpus")
    }
  }

  test("lshPlan: divisor-exact, τ-monotone in rows, S-curve threshold " +
      "lands near τ, and the planned bands drive lshBandKeys") {
    import graft.operators.Dedup
    // every plan multiplies back to numHashes
    for (h <- Seq(16, 64, 128); t <- Seq(0.3, 0.5, 0.8, 0.9)) {
      val (b, r) = Dedup.lshPlan(h, t)
      assert(b * r === h, s"h=$h tau=$t -> ($b,$r)")
      // the S-curve's step point (1/b)^(1/r) tracks τ within a band
      val step = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(step - t) < 0.35, s"h=$h tau=$t step=$step")
    }
    // a higher τ never wants FEWER rows per band (sharper curve, moved
    // right); fnWeight > 1 biases the step left of τ (completeness)
    val rowsAt = (t: Double) => Dedup.lshPlan(128, t)._2
    assert(rowsAt(0.3) <= rowsAt(0.5) && rowsAt(0.5) <= rowsAt(0.9))
    val (b5, r5) = Dedup.lshPlan(128, 0.5)
    assert(math.pow(1.0 / b5, 1.0 / r5) <= 0.5 + 1e-9)
    // planner output slots into lshBandKeys without the divisibility trap
    val sigs = Dedup.minHashSignatures(
      Seq((1L, "a b c d e f g"), (2L, "a b c d e f h")).toDF("doc_id", "text"),
      "doc_id", "text", numHashes = 16)
    val (bands, _) = Dedup.lshPlan(16, 0.7)
    val keys = Dedup.lshBandKeys(sigs, "doc_id", 16, bands)
    assert(keys.count() === 2L * bands)
  }

  test("editDistanceJoinAgainst property: random crawl-vs-corpus ≡ brute " +
      "force (union-df prefix order, shorts tier, cross-table)") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(29)
    val alpha = "abcde"
    def mutate(s: String, ops: Int): String = {
      var cur = s
      for (_ <- 0 until ops) {
        val i = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.take(i) + cur.drop(i + 1)
          case 1 => cur.take(i) + alpha(rnd.nextInt(5)) + cur.drop(i)
          case _ if cur.nonEmpty =>
            cur.take(i) + alpha(rnd.nextInt(5)) + cur.drop(i + 1)
          case _ => cur + alpha(rnd.nextInt(5))
        }
      }
      cur
    }
    for (trial <- 1 to 5) {
      val seeds = (0 until 6).map(_ =>
        (0 until (1 + rnd.nextInt(18))).map(_ => alpha(rnd.nextInt(5))).mkString)
      // corpus = seeds + mutations; probe = fresh mutations of the same
      // seeds (some matches, some misses) + one unrelated string
      val corpus = seeds.zipWithIndex.flatMap { case (s, i) =>
        Seq((i * 10L, s), (i * 10L + 1, mutate(s, rnd.nextInt(3))))
      }.toDF("id", "s")
      val probe = (seeds.zipWithIndex.map { case (s, i) =>
        (1000L + i, mutate(s, rnd.nextInt(5)))
      } :+ (1999L, "zzzzzzzz")).toDF("id", "s")
      val d = 2
      val got = Dedup.editDistanceJoinAgainst(probe, corpus, "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = probe.as("a").join(corpus.as("b"),
          levenshtein(col("a.s"), col("b.s")) <= d)
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.s"), col("b.s")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === brute, s"trial $trial")
    }
  }

  test("contamination: leaked doc ≈ 1, fresh doc = 0, short doc guarded") {
    import graft.operators.Dedup
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // fully leaked
      (2L, "completely novel benchmark question nobody saw"), // fresh
      (3L, "too short"))                                      // 0 shingles
      .toDF("doc_id", "text")
    val r = Dedup.contamination(probe, corpus, "doc_id", "text")
      .orderBy("probe_id")
      .select("probe_id", "n_sh", "n_hit", "containment").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r(0) == ((1L, 7L, 7L, 1.0)))
    assert(r(1) == ((2L, 4L, 0L, 0.0)))
    assert(r(2) == ((3L, 0L, 0L, 0.0)))
  }

  test("hash sampling: deterministic, partitioning-independent, " +
      "≈fraction; split intervals cover and never overlap") {
    import graft.operators.Sampling
    val df = spark.range(10000).select(col("id").as("doc_id"))
    val s1 = Sampling.hashSample(df, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    // same rows regardless of partitioning (the property df.sample lacks)
    val s2 = Sampling.hashSample(df.repartition(13), "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(math.abs(s1.size / 10000.0 - 0.1) < 0.02)
    // independent resample under a different salt
    val s3 = Sampling.hashSample(df, "doc_id", 0.1, salt = "b")
      .select("doc_id").as[Long].collect().toSet
    assert(s3 != s1)
    // splits: total partition, stable under appends by construction
    val sp = Sampling.hashSplit(df, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = sp.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") / 10000.0 - 0.8) < 0.02)
    // sample(0.8) is exactly the train split (same hash, same interval)
    val train = sp.filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(Sampling.hashSample(df, "doc_id", 0.8)
      .select("doc_id").as[Long].collect().toSet == train)
  }

  test("lsh band keys: identical sigs share all bands") {
    val df = Seq((1L, "x y z w v u"), (2L, "x y z w v u")).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(df, "doc_id", "text", 4)
    val bands = Dedup.lshBandKeys(sigs, "doc_id", 4, 2)
    val byBand = bands.groupBy("band", "band_key").count()
      .select("count").as[Long].collect()
    assert(byBand.toSeq == Seq(2L, 2L)) // both docs in both band buckets
  }

  test("connected components: chain, clique, singleton; labels = component min") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3 (transitive, not a clique), clique 4-5-6, singleton 7
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(nodes, edges, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
  }

  test("nearDupClusters: transitive chain collapses to one cluster; " +
      "cluster reps form the canonical survivor set") {
    // a ≈ b and b ≈ c by construction (share most shingles), a vs c less
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val df = Seq(
      (1L, base),
      (2L, base + " tail2"),
      (3L, base + " tail2 tail3"),
      (10L, "completely different content entirely here now ok fine yes"))
      .toDF("doc_id", "text")
    val cl = Dedup.nearDupClusters(df, "doc_id", "text", numHashes = 8,
      bands = 4, tau = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) == 1L && cl(2L) == 1L && cl(3L) == 1L && cl(10L) == 10L)
  }

  test("repetition signals: hand-computed fractions + empty/short guards") {
    val df = Seq(
      (1L, "a a a b"),            // top token 3/4; top bigram "a a" 2/3
      (2L, "x y. x y. z"),        // sents: ["x y","x y","z"] → dup 1/3
      (3L, ""),                   // 1 empty token; no bigrams
      (4L, "unique words only"))
      .toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
      TextAnalysis.topTokenFrac(col("text")).as("t"),
      TextAnalysis.topBigramFrac(col("text")).as("b"),
      TextAnalysis.dupSentFrac(col("text")).as("s"))
      .collect().map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(math.abs(r(1L)._1 - 0.75) < 1e-9)
    assert(math.abs(r(1L)._2 - 2.0 / 3.0) < 1e-9)
    assert(math.abs(r(2L)._3 - 1.0 / 3.0) < 1e-9)
    assert(r(3L)._1 == 1.0 && r(3L)._2 == 0.0) // [""] → one token, no bigrams
    assert(r(4L)._1 == 1.0 / 3.0 && r(4L)._3 == 0.0)
  }

  test("removeBoilerplate: shared sentences dropped, order kept, " +
      "all-boilerplate doc becomes empty") {
    val banner = "accept all cookies"
    val df = Seq(
      (1L, s"$banner. real content one. more text"),
      (2L, s"unique intro. $banner. body two"),
      (3L, s"$banner"),
      (4L, "totally original. nothing shared"))
      .toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(df, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "real content one. more text")
    assert(out(2L) == "unique intro. body two")
    assert(out(3L) == "")
    assert(out(4L) == "totally original. nothing shared")
  }

  test("packManifest: contiguous offsets, correct seq spans, and " +
      "partition-count invariance of the two-level prefix sum") {
    val df = Seq(
      (1L, "a b c d e"),       // 5 tokens  → [0, 5)
      (2L, "f g h"),           // 3 tokens  → [5, 8)
      (3L, ""),                // 0 tokens  → start 8, no slot
      (4L, (1 to 7).map(i => s"t$i").mkString(" "))) // 7 → [8, 15)
      .toDF("doc_id", "text")
    def run(parts: Int) =
      Packing.packManifest(df.repartition(parts), "doc_id", "text",
          seqLen = 4, partitions = parts)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val m = run(3)
    assert(m == Seq(
      (1L, 5L, 0L, 0L, 1L),   // tokens 0-4 → seqs 0..1
      (2L, 3L, 5L, 1L, 1L),   // tokens 5-7 → seq 1
      (3L, 0L, 8L, 2L, 2L),   // empty doc: offset advances, no slot
      (4L, 7L, 8L, 2L, 3L)))  // tokens 8-14 → seqs 2..3
    // the prefix sum is a pure function of (id, n): any partitioning
    // of the same corpus yields the identical manifest
    assert(run(1) == m && run(7) == m)
  }

  test("packManifest: non-numeric id types fail fast under bucketing " +
      "(even numeric-looking strings — they'd bucket numerically but " +
      "sort lexicographically); single-bucket path accepts any id") {
    val bad = Seq(("doc-a", "a b c"), ("doc-b", "d e f"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Packing.packManifest(bad, "doc_id", "text", seqLen = 4,
        partitions = 2)
    }
    assert(ex.getMessage.contains("requires a numeric id"))
    // numeric-LOOKING strings are the silent-corruption case ("10" <
    // "9" lexicographically) — must fail the same way, not run
    val numStr = Seq(("9", "a b c"), ("10", "d e f"))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.packManifest(numStr, "doc_id", "text", seqLen = 4,
        partitions = 2)
    }
    // single-bucket path imposes no numeric contract (raw-id ordering)
    val solo = Packing.packManifest(bad, "doc_id", "text", seqLen = 4,
        partitions = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(solo == Map("doc-a" -> 0L, "doc-b" -> 3L))
  }

  test("packManifest grouped: offsets and sequence ids restart per " +
      "group; each group's manifest equals packing it alone") {
    val df = Seq(
      (1L, "en", "a b c d e"), (2L, "de", "f g h"),
      (3L, "en", "i j"), (4L, "de", "k l m n o p q"))
      .toDF("doc_id", "lang", "text")
    val grouped = Packing.packManifest(df, "doc_id", "text", seqLen = 4,
        groupCol = Some("lang"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(grouped == Seq(
      (1L, "en", 5L, 0L, 0L, 1L), (2L, "de", 3L, 0L, 0L, 0L),
      (3L, "en", 2L, 5L, 1L, 1L), (4L, "de", 7L, 3L, 0L, 2L)))
    for (g <- Seq("en", "de")) {
      val alone = Packing.packManifest(df.filter(col("lang") === g),
          "doc_id", "text", seqLen = 4)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(alone == grouped.filter(_._2 == g)
        .map(t => (t._1, t._3, t._4, t._5, t._6)))
    }
    // grouped slices carry the group: every (group, seq_id) except each
    // group's last reassembles exactly seqLen tokens
    val man = Packing.packManifest(df, "doc_id", "text", seqLen = 4,
      groupCol = Some("lang"))
    val sl = Packing.packSlices(man, "doc_id", seqLen = 4,
        carryCols = Seq("lang"))
      .collect().map(r => (r.getString(1), r.getLong(0),
        r.getLong(4) - r.getLong(3))).toSeq
    val perSeq = sl.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    assert(perSeq(("en", 0L)) == 4L && perSeq(("en", 1L)) == 3L)
    assert(perSeq(("de", 0L)) == 4L && perSeq(("de", 2L)) == 2L)
  }

  test("packSlices: each full sequence reassembles exactly seqLen tokens " +
      "from in-doc contiguous slices") {
    val df = Seq.tabulate(20)(i => (i.toLong, (0 until 3 + i % 5)
      .map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val man = Packing.packManifest(df, "doc_id", "text", seqLen = 7)
    val slices = Packing.packSlices(man, "doc_id", seqLen = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = man.agg(sum("n_tokens")).as[Long].head()
    val bySeq = slices.groupBy(_._1)
    val fullSeqs = total / 7
    bySeq.foreach { case (seqId, ss) =>
      val len = ss.map(s => s._4 - s._3).sum
      if (seqId < fullSeqs) assert(len == 7L, s"seq $seqId has $len tokens")
      else assert(len == total % 7)
    }
    // slices of one doc across sequences are contiguous within the doc
    slices.groupBy(_._2).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._1)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).withFilter(_.length == 2).foreach { w =>
        assert(w(0)._4 == w(1)._3)
      }
    }
  }

  test("packSequences: gathered text crosses doc boundaries in corpus " +
      "order; every full sequence holds exactly seqLen tokens") {
    val df = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i"))
      .toDF("doc_id", "text")
    val out = Packing.packSequences(df, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (0L, 4L, "a b c d"),   // doc 1 + head of doc 2
      (1L, 4L, "e f g h"),   // tail of doc 2 + head of doc 3
      (2L, 1L, "i")))        // remainder
  }

  test("chunkDocs: full-coverage sliding windows with right-aligned " +
      "tail, short-doc and empty-doc edges") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10 > chunkLen
      (2L, "a b c"),                                   // n <= chunkLen
      (3L, ""))                                        // empty → no chunks
      .toDF("doc_id", "text")
    val out = Packing.chunkDocs(df, "doc_id", "text", chunkLen = 8, stride = 4)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // doc 1: m = ceil(2/4) = 1 full-stride start + tail at n-8 = 2
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 1L, 2L, (3 to 10).map(i => s"t$i").mkString(" ")),
      (2L, 0L, 0L, "a b c")))
    // every token of doc 1 appears in some chunk (coverage)
    val covered = out.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("tokenBudgetSample: over-budget strata downsample to ~budget " +
      "tokens, under-budget strata kept whole, unbudgeted dropped") {
    val rnd = new scala.util.Random(3)
    val df = Seq.tabulate(3000) { i =>
      val srcN = i % 3
      (i.toLong, s"s$srcN", Seq.fill(10 + rnd.nextInt(11))("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val budgets = Map("s0" -> 3000L, "s1" -> 1000000L) // s2 unbudgeted
    val kept = Sampling.tokenBudgetSample(df, "source", "doc_id",
        TextAnalysis.tokenCount(col("text")), budgets)
      .withColumn("n", TextAnalysis.tokenCount(col("text")))
      .groupBy("source").agg(sum("n").as("tok"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!kept.contains("s2"))
    assert(kept("s1")._2 == 1000L) // under budget: kept whole
    val s0 = kept("s0")._1
    assert(s0 > 1500 && s0 < 4500, s"s0 kept $s0 tokens, want ~3000")
    // determinism: the same call yields the same selection
    val again = Sampling.tokenBudgetSample(df.repartition(7), "source",
        "doc_id", TextAnalysis.tokenCount(col("text")), budgets)
      .agg(sum(TextAnalysis.tokenCount(col("text")))).as[Long].head()
    assert(again == kept.values.map(_._1).sum)
  }

  test("epochMix: over-budget strata repeat for multiple epochs, " +
      "under-budget strata subsample, epochs are dense 1..m") {
    val df = Seq.tabulate(300) { i =>
      (i.toLong, s"s${i % 3}", Seq.fill(10)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    // s0 holds 1000 tokens -> r=2.5; s1 -> r=0.4; s2 unbudgeted -> dropped
    val budgets = Map("s0" -> 2500L, "s1" -> 400L)
    val out = Sampling.epochMix(df, "source", "doc_id",
        TextAnalysis.tokenCount(col("text")), budgets)
      .select("doc_id", "source", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(!out.exists(_._2 == "s2"))
    // every s0 doc appears at least floor(2.5)=2 times; ~half get a 3rd
    val s0Counts = out.filter(_._2 == "s0").groupBy(_._1).map(_._2.length)
    assert(s0Counts.forall(c => c == 2 || c == 3))
    val total0 = s0Counts.sum
    assert(total0 > 200 && total0 < 300, s"s0 emitted $total0 rows, want ~250")
    // epochs per doc are exactly 1..m (dense, 1-based)
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // s1 subsamples: every kept doc appears exactly once
    val s1Counts = out.filter(_._2 == "s1").groupBy(_._1).map(_._2.length)
    assert(s1Counts.forall(_ == 1))
    assert(s1Counts.sum > 15 && s1Counts.sum < 65)
    // determinism across partitionings
    val again = Sampling.epochMix(df.repartition(7), "source", "doc_id",
        TextAnalysis.tokenCount(col("text")), budgets).count()
    assert(again == out.length)
  }

  test("labelPropagation: labels reach connected nodes, seeds clamp, " +
      "ties go to the smallest label, unreached nodes stay null") {
    // chain 1-2-3-4 seeded 7 at node 1; node 10 seeded 9 and wired to 2
    // (2's neighbors then vote 7 vs 9 -> tie -> smaller label 7);
    // node 99 isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 10L))
      .toDF("id_a", "id_b")
    val seeds = Seq((1L, 7), (10L, 9)).toDF("doc_id", "rating")
    val out = graft.operators.Dedup.labelPropagation(nodes, pairs,
        "doc_id", seeds, "rating", iters = 5).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).contains(7L) && out(10L).contains(9L)) // clamped
    assert(out(2L).contains(7L), out(2L)) // tie 7-vs-9 -> smaller
    assert(out(3L).isDefined && out(4L).isDefined) // chain reached
    assert(out(99L).isEmpty) // isolated: never labeled
    val again = graft.operators.Dedup.labelPropagation(
        nodes.repartition(5), pairs.repartition(3), "doc_id", seeds,
        "rating", iters = 5).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(again == out)
  }

  test("pageRank: mass conserves, hubs outrank leaves, isolated nodes " +
      "get base+dangling share, bit-deterministic across partitionings") {
    // star a<->{b,c,d} plus an isolated node e
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val pr = graft.operators.Dedup.pageRank(nodes, pairs, "doc_id",
        iters = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, pr.values.sum)
    // hub holds more mass than each leaf; leaves are symmetric
    assert(pr(1L) > pr(2L))
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L))
    // the isolated node keeps less than a leaf (no incoming edges,
    // only base + dangling share) but more than the bare base
    assert(pr(5L) < pr(2L) && pr(5L) > 0.15 / 5)
    val again = graft.operators.Dedup.pageRank(nodes.repartition(7),
        pairs.repartition(5), "doc_id", iters = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr == again) // decimal sums → bit-identical
  }

  test("curriculumBins: bins are monotone in score, near-equal-sized " +
      "on a uniform score, ties land in the lower bin") {
    val df = (0 until 1000).map(i => (i.toLong, i.toDouble))
      .toDF("id", "s")
    val out = Sampling.curriculumBins(df, col("s"), bins = 10)
      .select("id", "s", "bin").collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    assert(out.map(_._2).distinct.sorted.toSeq == (0 until 10))
    // monotone: sorting by score never decreases the bin
    val sorted = out.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    // near-equal sizes on a uniform distribution
    val sizes = out.groupBy(_._2).values.map(_.size)
    assert(sizes.forall(s => s >= 90 && s <= 110), sizes.toSeq.sorted)
    // a mass of ties AT an edge stays in the lower bin
    val ties = (0 until 100).map(i => (i.toLong, if (i < 50) 1.0 else 2.0))
      .toDF("id", "s")
    val tb = Sampling.curriculumBins(ties, col("s"), bins = 2)
      .select("s", "bin").distinct().collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toMap
    assert(tb(1.0) == 0 && tb(2.0) == 1)
  }

  test("leakSafeSplit: a cluster never straddles the boundary; " +
      "missing rows fall back to singleton id keys; fraction holds") {
    val df = (0L until 600L).toDF("doc_id")
    // 100 clusters of 5 (ids 0..499 -> cluster id/5*5), ids 500+ absent
    val clusters = (0L until 500L).map(i => (i, i / 5 * 5))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.leakSafeSplit(df, "doc_id", clusters,
        "cluster_id", valFraction = 0.25)
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString.toLong),
        r.getString(2)))
    assert(out.length == 600)
    // atomic clusters: one split value per cluster
    out.filter(_._2.isDefined).groupBy(_._2.get).foreach {
      case (c, rows) =>
        assert(rows.map(_._3).distinct.length == 1,
          s"cluster $c straddles the split")
    }
    val valFrac = out.count(_._3 == "val").toDouble / out.length
    info(s"val fraction = $valFrac")
    assert(valFrac > 0.1 && valFrac < 0.4)
    // unclustered tail present, keyed per-id (both sides appear)
    val tail = out.filter(_._1 >= 500).map(_._3).distinct
    assert(tail.sorted.toSeq == Seq("train", "val"))
    // append-stability: same rows keep their side when the corpus grows
    val grown = Sampling.leakSafeSplit((0L until 900L).toDF("doc_id"),
        "doc_id", clusters, "cluster_id", 0.25)
      .filter(col("doc_id") < 600)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.forall { case (id, _, s) => grown(id) == s })
  }

  test("shuffleShards: dense per-shard positions, balanced shards, " +
      "partitioning-invariant, append preserves relative order") {
    val df = (0L until 800L).toDF("doc_id")
    val out = Sampling.shuffleShards(df, "doc_id", shards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length == 800)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    // uniform hash → no shard more than 2x off the mean at n=800
    assert(byShard.values.forall(s => s.length > 50 && s.length < 200))
    // positions are exactly 0..m-1 within each shard
    byShard.values.foreach(s =>
      assert(s.map(_._3).sorted.toSeq == (0 until s.length)))
    // shuffled: shard-0 order is not doc_id order
    val s0 = byShard(0L).sortBy(_._3).map(_._1).toSeq
    assert(s0 != s0.sorted)
    // partitioning-invariant
    val again = Sampling.shuffleShards(df.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(again.toSeq == out.sorted.toSeq)
    // append-stability: with 400 more docs, surviving rows keep their
    // RELATIVE order within each shard (positions shift, order doesn't)
    val grown = Sampling.shuffleShards((0L until 1200L).toDF("doc_id"),
        "doc_id", 8).select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    (0L until 8L).foreach { sh =>
      val oldOrder = byShard(sh).sortBy(_._3).map(_._1).toSeq
      val newOrder = grown.filter(g => g._2 == sh && g._1 < 800)
        .sortBy(_._3).map(_._1).toSeq
      assert(newOrder == oldOrder, s"shard $sh relative order changed")
    }
  }

  test("hardNegatives: positive is the nearest same-label row, " +
      "negatives are other-label ranked by cosine, semi-hard band " +
      "flags correctly, lone-label anchors keep null pos") {
    // 2-D vectors on known angles: label 0 near 0°, label 1 near 90°,
    // one anchor with a unique label 9
    def vec(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val rows = Seq(
      (0L, vec(0), 0), (1L, vec(5), 0), (2L, vec(20), 0),
      (10L, vec(90), 1), (11L, vec(80), 1), (12L, vec(60), 1),
      (99L, vec(45), 9))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.hardNegatives(
        df.filter(col("vec_id").isin(0L, 99L)), df,
        "vec_id", "embedding", "label", k = 2, margin = 0.2)
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
        r.getLong(4), r.getInt(3), r.getBoolean(6))).toSeq
    // anchor 0: positive = id 1 (5° is nearer than 20°); hardest
    // negatives by cosine: 45° (id 99) then 60° (id 12)
    val a0 = out.filter(_._1 == 0L).sortBy(_._4)
    assert(a0.map(_._2).distinct == Seq(Some("1")))
    assert(a0.map(_._3) == Seq(99L, 12L))
    // cos(45°)≈0.707 vs pos_cos≈0.996: below the band → not semi-hard
    assert(a0.forall(!_._5))
    // anchor 99 (unique label): no positive, semi_hard false, but both
    // negative ranks still mined
    val a99 = out.filter(_._1 == 99L)
    assert(a99.length == 2 && a99.forall(_._2.isEmpty) && a99.forall(!_._5))
    // anchor 2 (20°): positive 1 (15° apart, cos≈0.966), negative 99
    // (25° apart, cos≈0.906 ∈ (0.766, 0.966)) → semi-hard fires
    val out2 = graft.operators.Similarity.hardNegatives(
        df.filter(col("vec_id") === 2L),
        df.filter(col("label") =!= 1), "vec_id", "embedding", "label",
        k = 1, margin = 0.2).collect()
    assert(out2.length == 1 && out2(0).getLong(4) == 99L &&
      out2(0).getBoolean(6))
  }

  test("dsir: selection prefers raw docs that look like the target " +
      "domain; deterministic across partitionings; pool-capped") {
    val vocabA = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val vocabB = Array("zero", "one", "two", "three", "four", "five",
      "six", "seven")
    val rnd = new scala.util.Random(31)
    def doc(v: Array[String]) =
      Seq.fill(40)(v(rnd.nextInt(v.length))).mkString(" ")
    // 50 target docs (vocab A), raw pool: 50 A-like + 50 B-like
    val rows =
      (0 until 50).map(i => (i.toLong, "tgt", doc(vocabA))) ++
      (100 until 150).map(i => (i.toLong, "rawA", doc(vocabA))) ++
      (200 until 250).map(i => (i.toLong, "rawB", doc(vocabB)))
    val df = rows.toDF("doc_id", "grp", "text")
    val sel = graft.operators.Dsir.select(df, "doc_id", "text",
        col("grp") === "tgt", n = 40, buckets = 512)
    val got = sel.join(df.select("doc_id", "grp"), "doc_id")
      .select("doc_id", "grp").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 40)
    assert(!got.exists(_._2 == "tgt"), "target docs must never be selected")
    val aShare = got.count(_._2 == "rawA").toDouble / got.length
    info(s"A-like share of selection = $aShare")
    assert(aShare >= 0.9, s"importance resampling should prefer " +
      s"target-like docs, got A-share $aShare")
    // determinism across partitionings (decimal sums + id-keyed gumbel)
    val again = graft.operators.Dsir.select(df.repartition(11), "doc_id",
        "text", col("grp") === "tgt", n = 40, buckets = 512)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.map(_._1).toSet)
    // n beyond the pool returns every scoreable raw doc
    val all = graft.operators.Dsir.select(df, "doc_id", "text",
      col("grp") === "tgt", n = 1000, buckets = 512)
    assert(all.count() == 100)
  }

  test("dedupLines: repeated sentence keeps exactly its first " +
      "(id, pos) occurrence; duplicate within one doc also collapses") {
    val df = Seq(
      (1L, "shared line. own one"),
      (2L, "intro two. shared line. own two"),
      (3L, "repeat me. repeat me. own three"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "shared line. own one")   // first occurrence wins
    assert(out(2L) == "intro two. own two")      // later copy dropped
    assert(out(3L) == "repeat me. own three")    // in-doc dup collapses
  }

  test("unigram LM: uniform corpus scores exactly log2(vocab) bits; " +
      "rare-token doc scores higher than common-token doc; OOV costs " +
      "oovBits") {
    // 4 tokens, each appearing exactly once → p = 1/4, bits = 2
    val uniform = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val lmU = TextAnalysis.unigramLm(uniform, "text")
    val u = TextAnalysis.lmBitsPerToken(uniform, "doc_id", "text", lmU)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(u(1L) - 2.0) < 1e-12 && math.abs(u(2L) - 2.0) < 1e-12)

    val corpus = Seq((1L, "the the the the the the the rare"))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.unigramLm(corpus, "text")
    val probe = Seq((10L, "the the"), (11L, "rare rare"), (12L, "unseen"))
      .toDF("doc_id", "text")
    val s = TextAnalysis.lmBitsPerToken(probe, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(10L) < s(11L))          // common tokens cost fewer bits
    assert(s(12L) == 30.0)           // OOV default
    assert(math.abs(s(10L) - (-math.log(7.0 / 8.0) / math.log(2.0))) < 1e-12)
  }

  test("bigram LM: detects scrambled text a unigram filter passes; " +
      "conditional probabilities well-formed; sub-2-token docs omitted") {
    // clean corpus: strong bigram structure ("aa bb" always adjacent)
    val corpus = (1L to 40L)
      .map(i => (i, "aa bb cc dd " * 3)).toDF("doc_id", "text")
    val lm = TextAnalysis.bigramLm(corpus, "text")
    // same unigram distribution, scrambled order
    val probe = Seq((100L, "aa bb cc dd aa bb cc dd"),
        (101L, "dd aa cc bb dd aa cc bb"),
        (102L, "solo")) // 1 token → no bigrams
      .toDF("doc_id", "text")
    val s = TextAnalysis.bigramBitsPerToken(probe, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(100L) < s(101L),
      s"in-order ${s(100L)} should beat scrambled ${s(101L)}")
    assert(!s.contains(102L))
    // p(bb|aa) near 1 in this corpus → ~0 bits for the (aa,bb) step
    val pAaBb = lm.filter(col("w1") === "aa" && col("w2") === "bb")
      .select("logp").as[Double].head()
    assert(pAaBb > -0.2 && pAaBb <= 0.0)
  }

  test("redactPii: emails, IPv4s, long digit runs scrubbed; short " +
      "numbers and plain text untouched") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "server at 192.168.001.254 port 8080"),
      (3L, "acct 123456789012 pin 1234"),
      (4L, "version 1.2.3 of 4 things")) // not an IP (3 octets), short nums
      .toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.redactPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail <EMAIL> now")
    assert(out(2L) == "server at <IP> port 8080")
    assert(out(3L) == "acct <NUM> pin 1234")
    assert(out(4L) == "version 1.2.3 of 4 things")
  }

  test("quantize: per-element reconstruction error <= scale/2; " +
      "quantized top-k agrees with float top-k on separated data") {
    // 10 well-separated clusters of 5 (center + small deterministic
    // noise): a probe's true top-5 is its cluster, with an inter-cluster
    // cosine gap far above int8 quantization error. Near-tie corpora
    // (gaps < ~0.5%) can legitimately reorder under int8 — that is a
    // property of quantization, not a bug, and not what we pin here.
    val vecs = Seq.tabulate(50) { i =>
      val cl = i % 10
      (i.toLong, Array.tabulate(16)(j =>
        (math.sin(cl * 37 + j * 3 + 1) * (1 + cl % 3)
          + 0.02 * math.sin(i * 7 + j)).toFloat))
    }.toDF("vec_id", "embedding")
    val qd = vecs.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"),
        Similarity.quantize(col("embedding")).as("q"))
      .select(col("vec_id"), col("v"), col("q.scale").as("s"), col("q.q").as("qv"))
      .collect()
    qd.foreach { r =>
      val v = r.getSeq[Double](1); val s = r.getDouble(2)
      val q = r.getSeq[Int](3)
      assert(q.forall(x => x >= -127 && x <= 127))
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(qi * s - x) <= s / 2 + 1e-12)
      }
    }
    // ranking fidelity: each probe's exact top-4 is its cluster; int8
    // must reproduce it
    val probes = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(probes, vecs, "vec_id", "embedding", 4)
      .select("query_id", "match_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = Similarity.quantizedTopK(probes, vecs, "vec_id", "embedding", 4)
      .select("query_id", "match_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val overlap = exact.keys.iterator.map(k => (exact(k) & quant(k)).size).sum
    assert(overlap == 40, s"int8 top-4 overlap $overlap/40")
  }

  test("tfidf: rare term outranks common term; rank tie-break by term") {
    val df = Seq(
      (1L, "common common rare"),
      (2L, "common other"),
      (3L, "common other thing"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", 3)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .collect().map(x => (x.getInt(1), x.getString(2), x.getDouble(3)))
    // doc 1: tf(common)=2 df=3; tf(rare)=1 df=1
    val n = 3.0
    val sCommon = 2 * (math.log((n + 1) / 4) + 1)
    val sRare = 1 * (math.log((n + 1) / 2) + 1)
    assert(r.head._2 == (if (sRare > sCommon) "rare" else "common"))
    assert(math.abs(r.map(_._3).max - math.max(sRare, sCommon)) < 1e-9)
    assert(r.length == 2)
  }

  test("stratifiedTopK: exact quota per stratum, append/partitioning " +
      "stability, small strata kept whole") {
    import graft.operators.Sampling
    val df = (1L to 500L).map(i => (i, if (i <= 490) "big" else "small"))
      .toDF("doc_id", "source")
    val s = Sampling.stratifiedTopK(df, "source", "doc_id", k = 10)
    val byStratum = s.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum == Map("big" -> 10L, "small" -> 10L)) // small: all 10 rows
    // partitioning independence: same picks after a repartition
    val ids = s.select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.stratifiedTopK(df.repartition(13), "source", "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == ids2)
    // append stability: adding rows to "big" never changes "small"'s picks
    val grown = df.union(Seq((1000L, "big"), (1001L, "big")).toDF("doc_id", "source"))
    val smallBefore = ids.filter(_ > 490)
    val smallAfter = Sampling.stratifiedTopK(grown, "source", "doc_id", 10)
      .filter(col("source") === "small").select("doc_id").as[Long].collect().toSet
    assert(smallAfter == smallBefore)
  }

  // ── Similarity ─────────────────────────────────────────────────

  test("native DotProduct: bit-identical to the zip_with/aggregate fold, " +
      "null/mismatch parity, codegen and interpreted paths agree") {
    import graft.functions.VectorExprs
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
    // adversarial doubles: catastrophic-cancellation-prone magnitudes make
    // any fold-order difference visible
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)),
      Seq.fill(64)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3))))
    val df = rows.toDF("a", "b")
    assert(df.select((VectorExprs.dot(col("a"), col("b")) <=>
      hof(col("a"), col("b"))).as("eq")).filter(!col("eq")).count() == 0)
    // mismatched lengths → null (zip_with pads with null and poisons the sum)
    val mm = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
      .select(VectorExprs.dot(col("a"), col("b"))).collect()(0)
    assert(mm.isNullAt(0))
    // null array → null; null element → null
    val ne = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)))).toDF("a", "b")
      .select(VectorExprs.dot(col("a"), col("b"))).collect()(0)
    assert(ne.isNullAt(0))
    // interpreted (eval) path — used inside HOF lambdas like ivfTopK's fold
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.functions.DotProduct(
      Literal.create(Seq(1.0, 2.0, 3.0)), Literal.create(Seq(4.0, 5.0, 6.0)))
    assert(e.eval(null) == 32.0)
  }

  test("native SortedIntersectCount: equals size(array_intersect) on " +
      "random sorted-distinct sets, codegen + interpreted + SQL paths") {
    import graft.functions.ArrayExprs
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 200).map(i => f"w$i%03d")
    val rows = Seq.fill(300)((
      rnd.shuffle(vocab).take(rnd.nextInt(60)).sorted,
      rnd.shuffle(vocab).take(rnd.nextInt(60)).sorted))
    val df = rows.toDF("a", "b")
    val diff = df.select(
      (ArrayExprs.sortedIntersectCount(col("a"), col("b")) <=>
        size(array_intersect(col("a"), col("b"))).cast("long")).as("eq"))
      .filter(!col("eq")).count()
    assert(diff == 0)
    // null input → null
    val n = Seq((Some(Seq("a")), Option.empty[Seq[String]])).toDF("a", "b")
      .select(ArrayExprs.sortedIntersectCount(col("a"), col("b"))).collect()(0)
    assert(n.isNullAt(0))
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val e = graft.functions.SortedIntersectCount(
      Literal.create(Seq("a", "b", "d"), ArrayType(StringType)),
      Literal.create(Seq("b", "c", "d"), ArrayType(StringType)))
    assert(e.eval(null) == 2L)
    // SQL surface
    val r = spark.sql(
      "SELECT graft_sorted_intersect(array('a','b','d'), array('b','c','d')) AS c")
      .collect()(0)
    assert(r.getLong(0) == 2L)
  }

  test("graft_dot is SQL-callable via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(spark.sql("SELECT graft_dot(array(1.0d), array(1.0d, 2.0d)) AS d")
      .collect()(0).isNullAt(0))
    assert(spark.sql("SELECT graft_word_shingles('a b c d', 3) AS s")
      .collect()(0).getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("meanPool: hand-computed per-key element-wise means and counts") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 6.0f)),
      ("b", Array(10.0f, 0.0f)))
      .toDF("k", "v")
    val out = Similarity.meanPool(df, "k", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(out("a") == (2L, Seq(2.0, 4.0)))
    assert(out("b") == (1L, Seq(10.0, 0.0)))
  }

  test("cosine: identity = 1, orthogonal = 0") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 2.0))).toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("bruteForceTopK finds the constructed nearest neighbor") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.1f, 0.0f)),  // near q0
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 1)
      .collect()(0)
    assert(top.getAs[Long]("match_id") == 1L)
  }

  test("cosineDedup removes near-identical vectors, keeps the min id") {
    val rnd = new scala.util.Random(13)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val jig = base.clone(); jig(0) = jig(0) + 0.01f // near-duplicate of base
    val vecs = ((0L until 10L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat))) ++
      Seq((10L, base.toSeq), (11L, jig.toSeq)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.cosineDedup(vecs, "vec_id", "embedding",
      tau = 0.99, bands = 2, planesPerBand = 3, dim = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(10L) && !kept.contains(11L)) // keep-min drops 11
    assert((0L until 10L).forall(kept)) // random vectors all survive
  }

  test("cosineDedup bucket cap drops over-cap buckets from candidates") {
    // 12 copies of the same vector: every band bucket holds all 12. With
    // maxBucket=4 the over-cap buckets are anti-joined out, so NO pair is
    // ever generated — all 12 survive (recall sacrificed by the guard, by
    // design). Without the cap, keep-min leaves only the min id.
    val v = Seq.fill(16)(1.0f)
    val vecs = (0L until 12L).map(i => (i, v)).toDF("vec_id", "embedding")
    val capped = Similarity.cosineDedup(vecs, "vec_id", "embedding",
      tau = 0.9, bands = 2, planesPerBand = 3, dim = 16, maxBucket = 4)
    assert(capped.count() == 12L)
    val uncapped = Similarity.cosineDedup(vecs, "vec_id", "embedding",
      tau = 0.9, bands = 2, planesPerBand = 3, dim = 16)
    assert(uncapped.select("vec_id").as[Long].collect().toSeq == Seq(0L))
  }

  test("lshDedup bucket cap drops over-cap band buckets from candidates") {
    // 10 identical docs share every band key (bucket size 10 in all 4
    // bands). maxBucket=4 anti-joins every bucket out → no candidate
    // pairs → all 10 survive; uncapped keep-min leaves only doc 0.
    val docs = (0L until 10L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val capped = Dedup.lshDedup(docs, "doc_id", "text", maxBucket = 4)
    assert(capped.count() == 10L)
    val uncapped = Dedup.lshDedup(docs, "doc_id", "text")
    assert(uncapped.select("doc_id").as[Long].collect().toSeq == Seq(0L))
  }

  test("ANN recall floors on real embeddings: LSH and IVF top-5 vs " +
      "exact brute force (sf0.001)") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "match_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = top5(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    def recallOf(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (k, t) =>
        approx.getOrElse(k, Set.empty).count(t).toDouble / t.size }
      hits.sum / hits.size
    }
    // 4×4-bit banded SRP (the q_ann_lsh config). Historical note: the
    // monolithic 8-plane bucket this replaced measured 0.02 here —
    // banding is what makes SRP recall usable; the floor guards against
    // silent recall collapse from a plan change
    val lsh = recallOf(top5(Similarity.lshTopK(
      q, e, "vec_id", "embedding", 5, planes = 16, dim = 64, bands = 4)))
    assert(lsh >= 0.4, s"LSH recall collapsed: $lsh")
    // IVF probing 8 of 16 cells keeps most of the mass
    val ivf = recallOf(top5(
      Similarity.ivfTopK(q, e, "vec_id", "embedding", 5, nlist = 16, nprobe = 8)))
    assert(ivf >= 0.6, s"IVF recall collapsed: $ivf")
    // query-directed multi-probe (flip the 2 least-confident bits per
    // band): strictly more candidates than the plain banded join, so
    // recall can only rise — and must beat it on this corpus
    val mp = recallOf(top5(Similarity.lshTopK(
      q, e, "vec_id", "embedding", 5, planes = 16, dim = 64, bands = 4,
      multiProbe = 2)))
    assert(mp >= lsh, s"multi-probe lost recall: $mp < $lsh")
    assert(mp >= 0.6, s"multi-probe recall floor: $mp")
    // IVF-SQ8: same routing as float IVF, int8 codes in the join — the
    // quantization must not cost more than a sliver of recall here
    val sq8 = recallOf(top5(Similarity.ivfTopKQuantized(
      q, e, "vec_id", "embedding", 5, nlist = 16, nprobe = 8)))
    assert(sq8 >= ivf - 0.1, s"IVF-SQ8 recall collapsed: $sq8 vs float $ivf")
  }

  test("banded cosineDedup recall: planted near-dups (cos ≈ 0.99) are " +
      "caught despite the bucketed candidate join") {
    // the corpus has no true near-dups (max pair cosine ≈ 0.5), so plant
    // 50 jittered copies: dup(i) = v(i) + 0.02·gaussian per dim — cos
    // ≈ 0.99 against the original (true near-duplicate territory; at
    // 4×8-bit banding the expected candidate recall there is ≈ 0.99)
    val base = graft.sources.Tables.load(
      spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val rnd = new scala.util.Random(31)
    val dups = base.take(50).map { case (id, v) =>
      (id + 1000L, v.map(_ + rnd.nextGaussian() * 0.02).toSeq) }
    val corpus = (base.map { case (id, v) => (id, v.toSeq) } ++ dups)
      .toSeq.toDF("vec_id", "embedding")
    val kept = Similarity.cosineDedup(corpus, "vec_id", "embedding",
      tau = 0.9, bands = 4, planesPerBand = 8, dim = 64)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // keep-min: the original survives, the planted copy is removed
    val missed = (0 until 50).count(i => kept(i + 1000L))
    assert(base.take(50).forall { case (id, _) => kept(id) })
    assert(missed <= 2, s"dedup missed $missed of 50 planted near-dups")
  }

  test("kmeans centroids: spherical cost monotone non-increasing from a " +
      "bad init, and trained IVF reaches exact top-1 on clustered data") {
    // 10 clusters of 5; ids ordered so the deterministic init (lowest
    // nlist ids) starts with only TWO distinct clusters — k-means must
    // spread out
    val vecs = Seq.tabulate(50) { i =>
      val cl = i / 5
      (i.toLong, Array.tabulate(16)(j =>
        (math.sin(cl * 2.39996 + j * 1.7 + 0.5) * 2.0
          + 0.03 * math.sin(i * 7 + j)).toFloat))
    }.toDF("vec_id", "embedding")
    def cost(cents: Array[Array[Double]]): Double = {
      val cl = cents.map(c => {
        val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n)
      })
      vecs.select(Similarity.asDouble(col("embedding"))).collect()
        .map(_.getSeq[Double](0).toArray).map { v =>
          val n = math.sqrt(v.map(x => x * x).sum)
          1.0 - cl.map(c => c.zip(v).map(p => p._1 * p._2).sum / n).max
        }.sum
    }
    val iters = (0 to 3).map(it =>
      cost(Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
        nlist = 10, iters = it)))
    iters.sliding(2).foreach { w =>
      assert(w(1) <= w(0) + 1e-9, s"cost went up: $iters")
    }
    assert(iters.last < iters.head, s"training never improved: $iters")
    // trained index: top-1 via nprobe=2 matches exact brute force
    val trained = Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
      nlist = 10, iters = 5)
    val probes = vecs.filter(col("vec_id") % 5 === 0)
    val exact = Similarity.bruteForceTopK(probes, vecs, "vec_id",
        "embedding", 1)
      .select("query_id", "match_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(probes, vecs, "vec_id", "embedding",
        k = 1, nlist = 10, nprobe = 2, centroids = Some(trained))
      .select("query_id", "match_id").as[(Long, Long)].collect().toMap
    assert(ivf == exact)
  }

  test("PQ: Lloyd distortion monotone non-increasing; ADC top-5 recall " +
      "floor vs exact L2 on real embeddings (sf0.001)") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val vecs = e.select(col("vec_id"), Similarity.asDouble(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def distortion(books: Array[Array[Array[Double]]]): Double = {
      val sub = books(0)(0).length
      vecs.values.map { v =>
        books.indices.map { s =>
          val sv = v.slice(s * sub, (s + 1) * sub)
          books(s).map(cw =>
            cw.zip(sv).map(p => (p._1 - p._2) * (p._1 - p._2)).sum).min
        }.sum
      }.sum / vecs.size
    }
    val d0 = distortion(Similarity.pqTrain(e, "vec_id", "embedding",
      m = 8, k = 16, iters = 0))
    val d3 = distortion(Similarity.pqTrain(e, "vec_id", "embedding",
      m = 8, k = 16, iters = 3))
    assert(d3 <= d0 + 1e-9 && d3 < d0, s"PQ training never improved: $d0 -> $d3")

    val books = Similarity.pqTrain(e, "vec_id", "embedding",
      m = 8, k = 16, iters = 3)
    val q = e.filter(col("vec_id") < 20)
    // exact L2 top-5, driver-side (ADC approximates L2, not cosine)
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map(p => (p._1 - p._2) * (p._1 - p._2)).sum
    val exact = (0L until 20L).map { qid =>
      qid -> vecs.filter(_._1 != qid).toSeq
        .sortBy { case (mid, v) => (l2(vecs(qid), v), mid) }
        .take(5).map(_._1).toSet
    }.toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "match_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.keys.iterator.map(k => (exact(k) & got(k)).size).sum / 100.0
    }
    val raw = recallOf(
      Similarity.pqTopK(q, e, "vec_id", "embedding", 5, books))
    assert(raw >= 0.15, s"raw ADC recall collapsed: $raw")
    // the standard exact re-rank of a 50-candidate ADC shortlist: the
    // corpus still pays only code lookups, survivors get exact L2
    val reranked = recallOf(Similarity.pqTopK(q, e, "vec_id", "embedding",
      5, books, rerank = 50))
    assert(reranked > raw, s"re-rank did not help: $reranked vs $raw")
    assert(reranked >= 0.5, s"re-ranked PQ recall floor: $reranked")
  }

  test("IVF with nprobe = nlist degenerates to exact brute force") {
    // 30 deterministic pseudo-random vectors; probing every cell must
    // reproduce the exact top-k (IVF only loses matches via unprobed cells)
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val brute = rows(Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 3))
    val ivf = rows(Similarity.ivfTopK(q, vecs, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 4))
    assert(ivf == brute)
    // with fewer probes: results are a subset of the probed cells, ranked
    val partial = Similarity.ivfTopK(q, vecs, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 1)
    assert(partial.count() <= brute.size)
  }

  // ── SeasonalModel ──────────────────────────────────────────────

  test("seasonal model reproduces a constant daily pattern exactly") {
    // 4 days, 4 buckets/day (interval 21600), value = slot index * 10
    val buckets = (0 until 16).map(i => (i * 21600L, (i % 4) * 10.0))
      .toDF("bucket", "observed")
    val p = SeasonalModelParams(bucketInterval = 21600L)
    val profile = SeasonalModel.train(buckets, "observed", p)
    val pred = SeasonalModel.predict(buckets, profile, "observed", p)
    val rows = pred.orderBy("bucket").collect()
    assert(rows.forall(r =>
      r.getDouble(r.fieldIndex("observed")) == r.getDouble(r.fieldIndex("predicted"))))
    // σ=0 → guard 1.0 → bands ±3
    assert(rows.forall(r =>
      r.getDouble(r.fieldIndex("upper")) - r.getDouble(r.fieldIndex("predicted")) == 3.0))
    // perfect prediction → score ~0 (approx-erf residue ≪ 0..100 resolution)
    assert(rows.forall(r => r.getDouble(r.fieldIndex("score")) < 1e-3))
    val f = SeasonalModel.forecast(spark, profile, 16 * 21600L, 20 * 21600L, p)
      .collect()
    assert(f.map(_.getDouble(1)).toSeq == Seq(0.0, 10.0, 20.0, 30.0))
  }

  // ── TextAnalysis ───────────────────────────────────────────────

  test("bpeTokenCount: GPT-2 pre-tokenizer piece counts on hand-built " +
      "strings") {
    val rows = Seq(
      (1L, "a b"),        // "a", " b"                         → 2
      (2L, "it's"),       // "it", "'s"                        → 2
      (3L, "x2"),         // "x", "2"                          → 2
      (4L, "hi!!"),       // "hi", "!!"                        → 2
      (5L, "The cat's  mat."), // The, " cat", 's, "  ", "mat", "." → 6
      (6L, ""))           // no pieces                         → 0
      .toDF("id", "t")
    val out = rows.select(col("id"),
        TextAnalysis.bpeTokenCount(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 6, 6L -> 0))
  }

  test("crossDocCoverage: shared occurrences counted with multiplicity, " +
      "short docs keep zeros") {
    val docs = Seq(
      (1L, "a b c d"),        // grams: abc, bcd
      (2L, "a b c x y z"),    // grams: abc, bcx, cxy, xyz
      (3L, "a b c a b c"),    // grams: abc, bca, cab, abc (abc ×2)
      (4L, "q r"))            // < 3 tokens → no grams
      .toDF("doc_id", "text")
    val out = TextAnalysis.crossDocCoverage(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // "a b c" appears in docs 1, 2, 3 → shared; everything else unique
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((4L, 1L, 0.25)))
    assert(out(3L) == ((4L, 2L, 0.5))) // both abc occurrences count
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("token count, fingerprint stability, langId, quality bounds") {
    val df = Seq(
      ("the fast small a the", 1L),
      ("The, fast; SMALL a the!", 2L),
      ("join merge sort stream join", 3L))
      .toDF("text", "id")
    val out = df.select(
      col("id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getString(2), r.getString(3), r.getDouble(4))).toMap
    assert(out(1L)._1 == 5)
    assert(out(1L)._2 == out(2L)._2) // punctuation/case-insensitive fingerprint
    assert(out(1L)._3 == "en" && out(3L)._3 == "de")
    assert(out.values.forall(v => v._4 >= 0.0 && v._4 <= 1.0))
  }

  test("duplicateSpans: corpus-duplicated n-grams merge into maximal " +
      "spans; stripDuplicateSpans removes exactly the covered words") {
    val corpus = Seq(
      (1L, "a b c d e f g"),        // "a b c","b c d" shared with doc 2
      (2L, "x y z a b c d q r s"),  // dup gram starts at 3,4
      (3L, "m m m m m m"),          // within-doc duplicate gram (count 4)
      (4L, "p q r"),                // unique single gram → no spans
      (5L, "a b c Q Q Q a b c"))    // dup starts 0 and 6: gap 6 > n → 2 spans
      .toDF("doc_id", "text")
    val spans = TextAnalysis.duplicateSpans(corpus, "doc_id", "text", 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(spans.toSeq == Seq(
      (1L, 0, 4, 2L),   // positions {0,1} → [0, 1+3)
      (2L, 3, 7, 2L),   // positions {3,4}
      (3L, 0, 6, 4L),   // positions {0..3} all "m m m"
      (5L, 0, 3, 1L), (5L, 6, 9, 1L)))
    val clean = TextAnalysis.stripDuplicateSpans(corpus, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    assert(clean(1L) == "e f g")
    assert(clean(2L) == "x y z q r s")
    assert(clean(3L) == "")            // fully duplicated doc vanishes
    assert(clean(4L) == "p q r")       // untouched doc passes through
    assert(clean(5L) == "Q Q Q")
  }

  // ── Multimodal ─────────────────────────────────────────────────

  test("decodeImage: real PNG/BMP bytes decode to pixel features; " +
      "non-image blobs fall back to the byte-stat kernel") {
    def pngBytes(rgb: Int, w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) rgb else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.Row
    // left half pure red, right half white, 8x4
    val rows = Seq(
      Row(1L, pngBytes(0xff0000, 8, 4, "png"), Row(0L, "image", 8, 4)),
      Row(2L, pngBytes(0x0000ff, 8, 4, "bmp"), Row(0L, "image", 8, 4)),
      Row(3L, "not an image at all".getBytes("UTF-8"),
        Row(0L, "image", 0, 0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), Multimodal.mediaSchema)
    val out = Multimodal.decodeImage(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](r.fieldIndex("features")))
      .toMap
    // png: w=8, h=4, meanR = (0.5*255 + 0.5*255)/255 = 1.0 (red half has
    // R=255, white half R=255); meanG = meanB = 0.5; aspect = 2
    assert(out(1L)(0) == 8.0 && out(1L)(1) == 4.0)
    assert(math.abs(out(1L)(2) - 1.0) < 1e-9)
    assert(math.abs(out(1L)(3) - 0.5) < 1e-9)
    assert(math.abs(out(1L)(4) - 0.5) < 1e-9)
    assert(math.abs(out(1L)(7) - 2.0) < 1e-9)
    // bmp: blue half → meanB = 1.0, meanR = 0.5
    assert(math.abs(out(2L)(4) - 1.0) < 1e-9)
    assert(math.abs(out(2L)(2) - 0.5) < 1e-9)
    // luma std positive on a two-tone image
    assert(out(1L)(6) > 0.0 && out(2L)(6) > 0.0)
    // non-image: identical to the stub kernel
    val stub = Multimodal.decodeStub(df.filter(col("media_id") === 3))
      .collect()(0)
    assert(out(3L) == stub.getSeq[Double](stub.fieldIndex("features")))
  }

  test("blob plumbing: schema, deterministic stub decode, frame sampling") {
    val df = Seq((1L, "abcdefgh" * 4)).toDF("doc_id", "text")
    val media = Multimodal.attachBlob(df, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "data", "meta"))
    val decoded = Multimodal.decodeStub(media).collect()(0)
    val feats = decoded.getSeq[Double](decoded.fieldIndex("features"))
    assert(feats.length == 8)
    // bytes cycle every 8 chars → feature j = byte('a'+j)/255 exactly
    assert(math.abs(feats(0) - 'a'.toInt / 255.0) < 1e-6)
    assert(math.abs(feats(7) - 'h'.toInt / 255.0) < 1e-6)
    val frames = Multimodal.frameSample(media, 4, frameBytes = 8).collect()
    assert(frames.length == 4)
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 8))
  }

  test("decodeBudget: deterministic blob cap before any decode (the 100 TB codec-CPU knob)") {
    val docs = (0 until 400)
      .map(i => (i.toLong, s"payload body $i ${"x" * (i % 9)}"))
      .toDF("doc_id", "text")
    val media = Multimodal.attachBlob(docs, "doc_id", "text")
    val kept = Multimodal.decodeBudget(media, "media_id", 0.25)
    val ids1 = kept.select("media_id").collect().map(_.getLong(0)).toSet
    // deterministic: same subset every run, stable under repartitioning
    val ids2 = Multimodal.decodeBudget(media.repartition(7), "media_id", 0.25)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // binomial around 100 of 400
    assert(ids1.size > 55 && ids1.size < 160, ids1.size.toString)
    // downstream decode sees only the budgeted blobs
    assert(Multimodal.decodeStub(kept).count() == ids1.size)
    // absolute form: a frame already under budget passes through intact
    assert(Multimodal.decodeBudgetRows(media, "media_id", 1000L)
      .count() == 400)
    val capped = Multimodal.decodeBudgetRows(media, "media_id", 50L)
    val n = capped.count()
    assert(n > 20 && n < 90, n.toString)
  }

  test("sampleAviFrames: MJPEG frames demux from a RIFF/AVI container " +
      "and decode; RIFF/WAVE and non-RIFF blobs yield zero rows") {
    import org.apache.spark.sql.Row
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def jpegGray(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", b)
      b.toByteArray
    }
    def buildAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val movi = new java.io.ByteArrayOutputStream()
      movi.write("movi".getBytes("US-ASCII"))
      frames.foreach { f =>
        movi.write("00dc".getBytes("US-ASCII"))
        movi.write(le32(f.length)); movi.write(f)
        if ((f.length & 1) == 1) movi.write(0) // word alignment pad
      }
      val hdrl = "hdrl".getBytes("US-ASCII") ++
        "avih".getBytes("US-ASCII") ++ le32(56) ++ new Array[Byte](56)
      val body = new java.io.ByteArrayOutputStream()
      body.write("AVI ".getBytes("US-ASCII"))
      body.write("LIST".getBytes("US-ASCII"))
      body.write(le32(hdrl.length)); body.write(hdrl)
      val mb = movi.toByteArray
      body.write("LIST".getBytes("US-ASCII"))
      body.write(le32(mb.length)); body.write(mb)
      val b = body.toByteArray
      "RIFF".getBytes("US-ASCII") ++ le32(b.length) ++ b
    }
    val levels = Seq(0, 60, 120, 180, 240)
    val avi = buildAvi(levels.map(jpegGray))
    // a genuine WAV (RIFF but not AVI) must NOT demux as video
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array[Byte](1, 2, 3, 4)), fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)
    val rows = Seq(
      Row(1L, avi, Row(0L, "video", 8, 8)),
      Row(2L, wavOut.toByteArray, Row(0L, "audio", 0, 0)),
      Row(3L, "not even riff".getBytes("UTF-8"), Row(0L, "video", 0, 0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), Multimodal.mediaSchema)
    val out = Multimodal.sampleAviFrames(df, 3).collect()
    assert(out.forall(_.getLong(0) == 1L)) // only the AVI demuxes
    val got = out.sortBy(_.getInt(1))
    assert(got.map(_.getInt(2)).toSeq == Seq(0, 1, 3)) // picks of 5 frames
    assert(got.forall(_.getInt(3) == 5))
    // JPEG is lossy but uniform frames decode near-exact
    val lumas = got.map(_.getSeq[Double](4)(5) * 255.0)
    assert(lumas.zip(Seq(0.0, 60.0, 180.0))
      .forall { case (a, b) => math.abs(a - b) < 3.0 }, lumas.toSeq)
  }

  test("pickIndices: Long product — no Int overflow when a crafted " +
      "container declares hundreds of thousands of frames") {
    // i*total in Int would overflow (99_999 × 250_000 ≈ 2.5e10) to a
    // negative index and kill the task on an untrusted blob
    val picks = Multimodal.pickIndices(100000, 250000)
    assert(picks.length == 100000)
    assert(picks.head == 0 && picks.last < 250000)
    assert(picks.forall(i => i >= 0 && i < 250000))
    assert(picks.sliding(2).forall(p => p(0) < p(1))) // strictly increasing
    // unchanged small-case semantics
    assert(Multimodal.pickIndices(3, 5) == Seq(0, 1, 3))
    assert(Multimodal.pickIndices(5, 3) == Seq(0, 1, 2))
    assert(Multimodal.pickIndices(3, 0).isEmpty)
  }

  test("demuxAvi edge cases: rec-nested frames, odd-size padding, " +
      "truncated chunks, and non-frame chunks are all handled") {
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] =
      cc.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
        (if ((payload.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, children: Array[Byte]): Array[Byte] = {
      val body = typ.getBytes("US-ASCII") ++ children
      "LIST".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    def riff(children: Array[Byte]): Array[Byte] = {
      val body = "AVI ".getBytes("US-ASCII") ++ children
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // frames nested inside a rec LIST within movi (interleaved-AVI
    // shape), plus an odd-sized frame (forces the pad byte), plus an
    // index chunk that must NOT be returned as a frame
    val f1 = Array[Byte](1, 2, 3)           // odd size → padded
    val f2 = Array[Byte](4, 5, 6, 7)
    val avi = riff(list("movi",
      chunk("00dc", f1) ++
        list("rec ", chunk("01db", f2)) ++
        chunk("idx1", Array[Byte](9, 9, 9, 9))))
    val frames = Multimodal.demuxAvi(avi)
    assert(frames.map(_.toSeq).toSeq == Seq(f1.toSeq, f2.toSeq))
    // truncation inside the trailing idx1 chunk: both frames survive
    val cutIdx = avi.dropRight(6)
    assert(Multimodal.demuxAvi(cutIdx).map(_.toSeq).toSeq ==
      Seq(f1.toSeq, f2.toSeq))
    // truncation inside f2's payload: only the complete frame harvests
    val cutF2 = avi.dropRight(14)
    assert(Multimodal.demuxAvi(cutF2).map(_.toSeq).toSeq == Seq(f1.toSeq))
    // a hdrl-only AVI (no movi) and an empty byte array yield nothing
    assert(Multimodal.demuxAvi(riff(list("hdrl",
      chunk("avih", new Array[Byte](56))))).isEmpty)
    assert(Multimodal.demuxAvi(Array.empty[Byte]).isEmpty)
    // crafted high-bit chunk size (u32 ≥ 2^31): must terminate (a
    // wrapped-to-negative Int size once left the cursor stuck — an
    // unkillable task) and salvage the frames before the bad chunk
    val evil = riff(list("movi",
      chunk("00dc", f1) ++
        ("00dc".getBytes("US-ASCII") ++ le32(0xFFFFFFF8) ++ f2)))
    assert(Multimodal.demuxAvi(evil).map(_.toSeq).toSeq == Seq(f1.toSeq))
  }

  test("sampleAviFrames: raw-DIB 00db frames decode through the strf " +
      "BITMAPINFOHEADER; without a vids strf they are skipped") {
    import org.apache.spark.sql.Row
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] =
      cc.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
        (if ((payload.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, children: Array[Byte]): Array[Byte] = {
      val body = typ.getBytes("US-ASCII") ++ children
      "LIST".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    def riff(children: Array[Byte]): Array[Byte] = {
      val body = "AVI ".getBytes("US-ASCII") ++ children
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // BITMAPINFOHEADER: 4×2, 24bpp, BI_RGB — row stride 12 (no padding)
    val bih = le32(40) ++ le32(4) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(24) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
      new Array[Byte](48)
    // solid-gray raw frame: every BGR byte = level (bottom-up is moot)
    def dibFrame(level: Int) = Array.fill(24)(level.toByte)
    val avi = riff(
      list("hdrl", list("strl", chunk("strh", strh) ++ chunk("strf", bih))) ++
        list("movi", chunk("00db", dibFrame(60)) ++ chunk("00db", dibFrame(200))))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(Row(1L, avi, Row(0L, "video", 0, 0)))).asJava),
      Multimodal.mediaSchema)
    val out = Multimodal.sampleAviFrames(df, 2).collect()
      .map(r => r.getInt(r.fieldIndex("frame_index")) ->
        r.getSeq[Double](r.fieldIndex("features"))).toMap
    assert(out.keySet == Set(0, 1))
    assert(out(0)(0) == 4.0 && out(0)(1) == 2.0)      // geometry from strf
    assert(math.abs(out(0)(5) - 60.0 / 255) < 1e-9)   // exact gray level
    assert(math.abs(out(1)(5) - 200.0 / 255) < 1e-9)
    // decodeMedia routes the same blob as video with real pixel features
    val dm = Multimodal.decodeMedia(df).collect()(0)
    assert(dm.getAs[String]("media_kind") == "video")
    assert(dm.getSeq[Double](dm.fieldIndex("features"))(0) == 4.0)
    // headerless AVI (no strf): raw frames can't decode → zero rows
    val noHdr = riff(list("movi", chunk("00db", dibFrame(60))))
    val df2 = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(Row(2L, noHdr, Row(0L, "video", 0, 0)))).asJava),
      Multimodal.mediaSchema)
    assert(Multimodal.sampleAviFrames(df2, 2).collect().isEmpty)
  }

  test("decodeMedia: mixed corpus routes each blob to its real codec") {
    import org.apache.spark.sql.Row
    def png(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", b)
      b.toByteArray
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val wav = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array[Byte](0, 64, -128, -64)),
        fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wav)
    // one-frame AVI from the shared mux path (BMP payload)
    val aviDf = Multimodal.buildAviBmp(
      Multimodal.attachBlob(Seq((9L, "abcdefgh")).toDF("doc_id", "text"),
        "doc_id", "text", "video"), frames = 1)
    val avi = aviDf.collect()(0).getAs[Array[Byte]]("data")
    val rows = Seq(
      Row(1L, avi, Row(0L, "?", 0, 0)),
      Row(2L, wav.toByteArray, Row(0L, "?", 0, 0)),
      Row(3L, png(100), Row(0L, "?", 0, 0)),
      Row(4L, "plain text bytes".getBytes("UTF-8"), Row(0L, "?", 0, 0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), Multimodal.mediaSchema)
    val out = Multimodal.decodeMedia(df).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[String]("media_kind"), r.getSeq[Double](r.fieldIndex("features"))))
      .toMap
    assert(out(1L)._1 == "video" && out(1L)._2(0) == 8.0) // frame width = 8 bytes
    assert(out(2L)._1 == "audio" && out(2L)._2(0) == 8000.0)
    assert(out(3L)._1 == "image" && out(3L)._2(0) == 4.0)
    assert(out(4L)._1 == "binary")
    val stub = Multimodal.decodeStub(df.filter(col("media_id") === 4)).collect()(0)
    assert(out(4L)._2 == stub.getSeq[Double](stub.fieldIndex("features")))
  }

  test("decodeAudio: real WAV roundtrip (8-bit unsigned payload) and a " +
      "16-bit signed sine; non-audio blobs fall back to the byte-stat kernel") {
    // 8-bit path: buildWav wraps the blob bytes as PCM samples — decode
    // must recover header fields and exact sample stats
    val text = "abcd"
    val media = Multimodal.attachBlob(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", kind = "audio")
    val wav = Multimodal.buildWav(media)
    val blob = wav.collect()(0).getAs[Array[Byte]]("data")
    assert(new String(blob.take(4), "US-ASCII") == "RIFF") // genuine container
    val out = Multimodal.decodeAudio(wav).collect()(0)
    val f = out.getSeq[Double](out.fieldIndex("features"))
    assert(f(0) == 8000.0 && f(1) == 1.0 && f(2) == 4.0) // rate/ch/frames
    assert(math.abs(f(3) - 4.0 / 8000.0) < 1e-12)        // duration
    val samples = text.getBytes("UTF-8").map(b => ((b & 0xff) - 128.0) / 128.0)
    assert(f(4) == samples.sum / 4)                       // mean (exact doubles)
    assert(f(5) == math.sqrt(samples.map(v => v * v).sum / 4))
    assert(f(6) == samples.map(math.abs).max)

    // 16-bit signed little-endian sine at amplitude 0.5: rms ≈ A/√2,
    // peak ≈ A, zero-crossing rate ≈ 2·cycles/nSamples
    val rate = 8000f; val n = 8000; val cycles = 100
    val fmt16 = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (0.5 * math.sin(2 * math.Pi * cycles * i / n) * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt16, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    import org.apache.spark.sql.Row
    val rows16 = Seq(
      Row(2L, bos.toByteArray, Row(0L, "audio", 0, 0)),
      Row(3L, "definitely not audio".getBytes("UTF-8"), Row(0L, "audio", 0, 0)))
    val df16 = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows16).asJava), Multimodal.mediaSchema)
    val out16 = Multimodal.decodeAudio(df16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](r.fieldIndex("features"))).toMap
    assert(out16(2L)(0) == 8000.0 && out16(2L)(2) == n.toDouble)
    assert(math.abs(out16(2L)(5) - 0.5 / math.sqrt(2)) < 1e-3) // rms
    assert(math.abs(out16(2L)(6) - 0.5) < 1e-3)                // peak
    assert(math.abs(out16(2L)(7) - 2.0 * cycles / n) < 1e-3)   // zcr
    // non-audio: identical to the stub kernel
    val stub = Multimodal.decodeStub(df16.filter(col("media_id") === 3))
      .collect()(0)
    assert(out16(3L) == stub.getSeq[Double](stub.fieldIndex("features")))
  }

  test("decodeAudio: ULAW-companded AU decodes through the JDK codec to " +
      "true sample stats (not companded-bytes-as-linear)") {
    import javax.sound.sampled._
    // same 0.5-amplitude sine as the 16-bit test, companded to 8-bit ULAW
    val rate = 8000f; val n = 8000; val cycles = 100
    val fmt16 = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (0.5 * math.sin(2 * math.Pi * cycles * i / n) * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      rate, 8, 1, 1, rate, false)
    val ulaw = AudioSystem.getAudioInputStream(ulawFmt,
      new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt16, n.toLong))
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulaw, AudioFileFormat.Type.AU, bos)
    import org.apache.spark.sql.Row
    val rows = Seq(Row(7L, bos.toByteArray, Row(0L, "audio", 0, 0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), Multimodal.mediaSchema)
    val out = Multimodal.decodeAudio(df).collect()(0)
    val f = out.getSeq[Double](out.fieldIndex("features"))
    assert(f(0) == 8000.0 && f(1) == 1.0 && f(2) == n.toDouble)
    // ULAW is 8-bit log-companded: loose tolerance, but nowhere near the
    // garbage the old companded-as-linear read would produce
    assert(math.abs(f(5) - 0.5 / math.sqrt(2)) < 2e-2)  // rms
    assert(math.abs(f(6) - 0.5) < 2e-2)                 // peak
    assert(math.abs(f(7) - 2.0 * cycles / n) < 2e-3)    // zcr
  }

  test("sampleGifFrames: animated GIF frames sample evenly with real " +
      "pixel features; single-frame PNG yields one row; junk yields none") {
    import org.apache.spark.sql.Row
    def grayFrame(level: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    // 6 solid-gray frames at levels 0,40,…,200 (≤256 colors → GIF is
    // lossless here, so decoded luma is exact)
    (0 until 6).foreach(i => writer.writeToSequence(
      new javax.imageio.IIOImage(grayFrame(i * 40), null, null), null))
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val png = {
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(grayFrame(120), "png", b)
      b.toByteArray
    }
    val rows = Seq(
      Row(1L, bos.toByteArray, Row(0L, "video", 4, 4)),
      Row(2L, png, Row(0L, "image", 4, 4)),
      Row(3L, "junk bytes".getBytes("UTF-8"), Row(0L, "video", 0, 0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), Multimodal.mediaSchema)
    val out = Multimodal.sampleGifFrames(df, 3).collect()
    val gif = out.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    assert(gif.map(_.getInt(2)).toSeq == Seq(0, 2, 4)) // even spacing
    assert(gif.forall(_.getInt(3) == 6))               // total frame count
    val lumas = gif.map(_.getSeq[Double](4)(5) * 255.0)
    assert(lumas.zip(Seq(0.0, 80.0, 160.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-6 })
    val single = out.filter(_.getLong(0) == 2L)
    assert(single.length == 1 && single(0).getInt(3) == 1)
    assert(math.abs(single(0).getSeq[Double](4)(5) * 255.0 - 120.0) < 1e-6)
    assert(!out.exists(_.getLong(0) == 3L))            // junk → zero rows
  }

  test("Tables.fanOut: under-split source redistributes to default " +
      "parallelism; an already-split source passes through untouched") {
    import org.apache.spark.sql.functions._
    val par = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft_fan").toString
    spark.range(1000).selectExpr("id AS doc_id", "id % 7 AS v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir)
    assert(one.rdd.getNumPartitions < par) // premise: under-split
    val fanned = graft.sources.Tables.fanOut(one, "doc_id")
    assert(fanned.rdd.getNumPartitions == par, fanned.rdd.getNumPartitions)
    // identical content (it is only a repartition)
    assert(fanned.orderBy("doc_id").collect().toSeq ==
      one.orderBy("doc_id").collect().toSeq)
    // a source that already yields >= par/2 partitions is returned as-is
    val wide = one.repartition(par, col("doc_id"))
    val kept = graft.sources.Tables.fanOut(wide, "doc_id")
    assert(kept.queryExecution.logical eq wide.queryExecution.logical)
    // minBytes floor: an under-split but SMALL source stays untouched
    // (the exchange's fixed cost exceeds any parallelism win there)
    val small = graft.sources.Tables.fanOut(one, "doc_id",
      minBytes = 1L << 40)
    assert(small.queryExecution.logical eq one.queryExecution.logical)
  }
}
