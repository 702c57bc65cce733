package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: lay the corpus out as one virtual
  * token stream (docs concatenated in id order) and cut it into
  * fixed-length training sequences — the "concat-and-chunk" step every
  * LLM data pipeline runs after cleaning/dedup.
  *
  * The primitive is a GLOBAL EXCLUSIVE PREFIX SUM of per-doc token
  * counts: doc d starts at `sum(n_tokens of all docs with id < d.id)`.
  * The naive plan (`sum over (ORDER BY id)`) is a single-partition
  * window — the textbook scale-killer. Instead the classic two-level
  * scan:
  *
  *   1. project the corpus down to its manifest `(id, n_tokens)` —
  *      ~16 bytes/row, ~0.1% of a text corpus, so later exchanges move
  *      the manifest, never the documents;
  *   2. assign each row an ordered bucket id from per-group QUANTILE
  *      BOUNDARIES of the id (collected once, embedded in the plan as
  *      literals), then a per-bucket running sum
  *      (`Window.partitionBy(bucket)` — parallel across buckets, each
  *      window bounded by one bucket's rows);
  *   3. per-bucket totals (one tiny agg, numBuckets rows) are
  *      collected, cumulated on the driver, and broadcast-joined back
  *      as the bucket base offsets.
  *
  * Total cost: one boundary job + one exchange of the manifest + an
  * O(buckets) driver step — at 100 TB / 100B docs that is a few GB
  * shuffled, vs the single-window plan that funnels every row through
  * one task.
  *
  * Determinism: the result is a pure function of `(id, n_tokens)`, and
  * so is every INTERMEDIATE — the bucket id is computed from boundary
  * literals, not from `spark_partition_id()`, so separate actions,
  * AQE re-plans, and block-loss recomputes all assign identical
  * buckets by construction. (The previous design range-partitioned and
  * read the physical partition index, which `RangePartitioner`'s
  * per-RDD-id sampling seed can redraw per materialization; it needed
  * an eager `localCheckpoint` pin and still left the recompute path
  * unpinned.) Any partitioning of the same corpus yields
  * byte-identical manifests (spec-proven across shuffle-partition
  * counts and AQE settings), and the layout is reproducible across
  * runs/engines (DuckDB oracle).
  */
object Packing {

  /** Packing manifest: for each doc, its global token offset and the
    * range of `seqLen`-token training sequences it lands in.
    *
    * Output: `(idCol, n_tokens, start_token, seq_first, seq_last)`,
    * where `seq_first = start_token / seqLen` and `seq_last` is the
    * sequence holding the doc's final token (empty docs: `seq_first`,
    * occupying no slot). Ids must be unique; corpus order = id order.
    *
    * `sizeExpr` is the per-doc token count (defaults to
    * [[TextAnalysis.tokenCount]] of `textCol`); pass a precomputed
    * column (e.g. a real tokenizer's count) to pack by it.
    *
    * `groupCol` packs each group independently (per-language/source
    * shards): offsets and sequence ids restart at 0 within every group,
    * and the output carries the group column. Driver work grows to
    * O(groups·partitions) — shard-level cardinalities only.
    */
  def packManifest(df: DataFrame, idCol: String, textCol: String,
      seqLen: Long, sizeExpr: Option[Column] = None,
      partitions: Int = 0, groupCol: Option[String] = None): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val nParts =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // grouped packing (per-language/source shard): offsets and sequence
    // ids restart per group, so each shard packs independently — the
    // string-keyed group rides every exchange and the driver cumsum.
    val grp = groupCol.map(g => col(g).cast("string"))
      .getOrElse(lit("")).as("__grp")
    val sized = df.select(col(idCol) +: grp +:
      groupCol.map(g => col(g).as("__gorig")).toSeq :+
      sizeExpr.getOrElse(TextAnalysis.tokenCount(col(textCol)))
        .cast("long").as("n_tokens"): _*)

    // Ordered bucket id as a PURE FUNCTION of (grp, id): per-group
    // quantile boundaries of the id, collected ONCE and baked into the
    // plan as literals. The offsets job and the final join are separate
    // actions; deriving the bucket from data (never from the physical
    // partition index) makes every action/recompute agree by
    // construction — no checkpoint pin needed, and a lost block
    // recomputes to the same values. Boundary placement only decides
    // WHERE the prefix sum is assembled, never its value, so the
    // approximate quantiles are fine (skew just unbalances buckets).
    // The bucketed path requires a NUMERIC id column (schema-checked —
    // zero runtime cost): buckets come from the double cast while the
    // in-bucket window orders by the raw id, and only numeric types
    // keep those two orderings consistent. String ids — even
    // numeric-looking ones — would bucket numerically but sort
    // lexicographically ("10" < "9"), silently corrupting start_token
    // offsets; a non-castable id would land every row in bucket 0 the
    // same silent way. (long→double bucketing stays order-consistent
    // above 2^53: the cast is monotone, equal doubles share a bucket,
    // and the raw long ordering refines within it.) The single-bucket
    // path orders by the raw id alone and accepts any orderable type.
    val idIsNumeric = df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    if (nParts > 1 && !idIsNumeric)
      throw new IllegalArgumentException(
        s"packManifest: id column '$idCol' is " +
          s"${df.schema(idCol).dataType.simpleString}, but bucketed " +
          "packing requires a numeric id (bucket assignment is numeric " +
          "while in-bucket ordering is raw — any other type can " +
          "silently corrupt start_token offsets). Use a numeric id, or " +
          "partitions = 1 for the single-bucket path.")
    val bucketed =
      if (nParts <= 1) sized.withColumn("__pid", lit(0))
      else {
        // collect the boundaries in ONE job and embed them as a map
        // LITERAL — percentile_approx's partial-merge order is not
        // guaranteed stable across materializations, so a lazy join
        // against it could assign different buckets per action; a
        // literal cannot. O(groups) driver rows, nParts-1 doubles each.
        val qs = (1 until nParts).map(_.toDouble / nParts)
        val boundsMap: Map[String, Seq[Double]] = sized
          .groupBy(col("__grp"))
          .agg(percentile_approx(col(idCol).cast("double"),
            typedLit(qs), lit(10000)).as("__bounds"))
          .collect()
          .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
        sized.withColumn("__pid",
          aggregate(element_at(typedLit(boundsMap), col("__grp")),
            lit(0),
            (acc, b) => acc + when(col(idCol).cast("double") > b, 1)
              .otherwise(0)))
      }
    val w = Window.partitionBy(col("__grp"), col("__pid"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // No persist: the totals job below needs only per-bucket SUMS (not
    // the window's prefix sum), so it aggregates the pre-window frame —
    // cheaper than the old local-frame totals (no sort) — and the final
    // join recomputes the tokenize+window once per downstream action.
    // Every value is a pure function of the data, so the recompute is
    // byte-identical; a cached manifest here outlived the call (an
    // app-lifetime corpus-sized leak per invocation). Callers packing a
    // large corpus should write the manifest out once instead of
    // re-materializing it.
    val local = bucketed.withColumn("__local",
      coalesce(sum(col("n_tokens")).over(w), lit(0L)))

    // (group, bucket) totals → driver cumsum per group → broadcast
    // base offsets. collect() is O(groups·buckets): shard-level
    // grouping (languages, sources) keeps this driver-sized.
    val totals = bucketed.groupBy(col("__grp"), col("__pid"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val bases = totals.foldLeft(
      (List.empty[(String, Int, Long)], "", 0L)) {
      case ((acc, prevGrp, run), (g, pid, tot)) =>
        val base = if (g == prevGrp) run else 0L
        ((g, pid, base) :: acc, g, base + tot)
    }._1.reverse
    val baseDf = df.sparkSession.createDataFrame(bases)
      .toDF("__grp", "__pid", "__base")

    val start = col("__base") + col("__local")
    val head = col(idCol) +: groupCol.map(g => col("__gorig").as(g)).toSeq
    local.join(broadcast(baseDf), Seq("__grp", "__pid"))
      .select(head ++ Seq(col("n_tokens"),
        start.as("start_token"),
        floor(start / seqLen).as("seq_first"),
        when(col("n_tokens") === 0, floor(start / seqLen))
          .otherwise(floor((start + col("n_tokens") - 1) / seqLen))
          .as("seq_last")): _*)
  }

  /** Materialize the packed training sequences themselves: gather each
    * sequence's token slices from its source docs and concatenate them
    * in corpus order — the end product of [[packManifest]]/[[packSlices]].
    * Output: `(groupCol?, seq_id, n_tokens, seq_text)`; every sequence
    * except each (group's) last holds exactly `seqLen` tokens
    * (oracle-checked via md5 over the text).
    *
    * Scale shape: the manifest/slices side is O(docs + tokens/seqLen)
    * rows; the token gather is one id-keyed join against the corpus
    * (docs project straight to their token arrays — text moves once),
    * and the per-sequence groupBy collects ≤ seqLen tokens per row, so
    * reducer buffers are bounded by the sequence length, never by doc
    * or corpus size. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Long, groupCol: Option[String] = None): DataFrame = {
    val man = packManifest(docs, idCol, textCol, seqLen, groupCol = groupCol)
    val slices = packSlices(man, idCol, seqLen, carryCols = groupCol.toSeq)
    val toks = docs.select(col(idCol),
      expr(s"regexp_extract_all($textCol, '[A-Za-z0-9]+', 0)").as("__toks"))
    val keys = groupCol.map(col).toSeq :+ col("seq_id")
    slices.join(toks, idCol)
      .select(keys ++ Seq(col(idCol),
        slice(col("__toks"), col("doc_from") + 1,
          (col("doc_to") - col("doc_from")).cast("int")).as("__piece"),
        (col("doc_to") - col("doc_from")).as("__n")): _*)
      .groupBy(keys: _*)
      .agg(sum(col("__n")).as("n_tokens"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col(idCol), col("__piece")))),
          x => x.getField("__piece"))), " ").as("seq_text"))
  }

  /** Split each document into overlapping token chunks — the
    * chunk-then-embed preparation for retrieval/similarity pipelines.
    * Windows are `chunkLen` tokens, advancing by `stride`; the final
    * window is right-aligned at `n - chunkLen` so coverage is complete
    * without a redundant contained tail (docs with ≤ `chunkLen` tokens
    * yield one chunk; empty docs yield none). Tokens are the
    * `[A-Za-z0-9]+` runs of [[TextAnalysis.tokenCount]], and chunk text
    * is those tokens space-joined (punctuation does not survive —
    * chunking is an embedding-prep step, not a reconstruction).
    *
    * Output: `(idCol, chunk_id, start_token, chunk)`. Narrow per-row
    * explode, O(tokens/stride) rows, no shuffle (plan-audited via the
    * oracle query); deterministic and engine-independent.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1 && stride >= 1, "chunkLen and stride must be >= 1")
    require(stride <= chunkLen,
      "stride > chunkLen would leave uncovered token gaps")
    val toks = expr(s"regexp_extract_all($textCol, '[A-Za-z0-9]+', 0)")
    val n = size(toks)
    // m full-stride starts, then the right-aligned tail start
    val m = when(n <= chunkLen, lit(0))
      .otherwise(ceil((n - chunkLen).cast("double") / stride).cast("int"))
    val starts = concat(
      when(m === 0, array().cast("array<int>"))
        .otherwise(transform(sequence(lit(0), m - 1), i => i * stride)),
      array(greatest(n - chunkLen, lit(0))))
    df.select(col(idCol), toks.as("__toks"), n.as("__n"),
        posexplode(when(n === 0, array().cast("array<int>"))
          .otherwise(starts)).as(Seq("chunk_id", "start_token")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("start_token").cast("long").as("start_token"),
        array_join(slice(col("__toks"), col("start_token") + 1,
          least(lit(chunkLen), col("__n") - col("start_token"))), " ")
          .as("chunk"))
  }

  /** Explode a [[packManifest]] into per-(sequence, doc) slices: for
    * each training sequence, which token range of which doc fills it.
    * Output: `(seq_id, idCol, doc_from, doc_to)` with `[doc_from,
    * doc_to[` token offsets WITHIN the doc; a sequence's slices ordered
    * by `idCol` reassemble its `seqLen` tokens exactly (last sequence
    * may be a remainder). Narrow explode over the manifest — each doc
    * emits `seq_last - seq_first + 1` rows, so the result is
    * O(docs + totalTokens/seqLen); no additional shuffle.
    *
    * For a GROUPED manifest pass the group column in `carryCols`:
    * sequence ids are per-group there, so `(group, seq_id)` — not
    * `seq_id` alone — identifies a training sequence.
    */
  def packSlices(manifest: DataFrame, idCol: String, seqLen: Long,
      carryCols: Seq[String] = Nil): DataFrame = {
    val seq = explode(sequence(col("seq_first"), col("seq_last")))
    manifest.filter(col("n_tokens") > 0)
      .select(col(idCol) +: carryCols.map(col) ++: Seq(col("n_tokens"),
        col("start_token"), seq.as("seq_id")): _*)
      .select(col("seq_id") +: carryCols.map(col) ++: Seq(col(idCol),
        (greatest(col("seq_id") * seqLen, col("start_token"))
          - col("start_token")).as("doc_from"),
        (least((col("seq_id") + 1) * seqLen,
          col("start_token") + col("n_tokens"))
          - col("start_token")).as("doc_to")): _*)
  }
}
