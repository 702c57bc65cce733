package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training over a corpus — the tokenizer-
  * building step of a training-data pipeline ([[TextAnalysis.bpeTokenCount]]
  * estimates budgets with a FIXED pre-tokenizer; this LEARNS the merge
  * table itself).
  *
  * The split of work follows how production tokenizer trainers are
  * actually built (word-level pre-tokenization, then merges over the
  * word-frequency table — the standard public BPE recipe from Sennrich
  * et al. 2016): the 100 TB part of the job is the word COUNT — one
  * explode + one vocabulary-bounded aggregation whose exchange carries
  * distinct words, not the corpus — and the merge loop then runs over
  * that frequency table, whose size is the language's vocabulary
  * (≤ ~10⁶ rows), not the corpus. A driver-side loop over a
  * vocabulary-bounded table is the correct scale design, not a
  * shortcut; the guard makes the bound explicit and fails fast with
  * the remedy when a corpus blows past it.
  *
  * Determinism: pair selection breaks frequency ties lexicographically,
  * so the merge table is a pure function of the word-frequency table.
  */
object BpeTrainer {

  val EndOfWord = "</w>"

  /** Distributed word-frequency table: lowercased alphanumeric runs. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `numMerges` BPE merge rules. Returns merges in learned order
    * (apply order = rank order). `maxVocab` caps the collected
    * word-frequency table — natural-language vocabularies sit well
    * under it; corpora that exceed it (e.g. random ids tokenized as
    * words) fail fast with the remedy instead of spilling the driver. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1000000): Seq[(String, String)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val wc = wordCounts(df, textCol)
    val capped = wc.limit(maxVocab + 1).collect()
    if (capped.length > maxVocab)
      throw new IllegalArgumentException(
        s"word vocabulary exceeds maxVocab=$maxVocab — this corpus is " +
          "not natural-language-shaped (random ids?); pre-filter the " +
          "text or raise maxVocab")
    val freqs: Array[(Array[String], Long)] = capped.map { r =>
      (r.getString(0).map(_.toString).toArray :+ EndOfWord, r.getLong(1))
    }
    learnFromFreqs(freqs, numMerges)
  }

  /** The local merge loop over the collected frequency table (public
    * algorithm: count symbol-pair frequencies weighted by word count,
    * merge the most frequent pair, repeat). */
  private[operators] def learnFromFreqs(
      freqs0: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String)] = {
    var freqs = freqs0
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      freqs.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max frequency, lexicographic tie-break → deterministic table
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        freqs = freqs.map { case (syms, cnt) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), cnt)
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Tokenize one word with a learned merge table (merges applied in
    * rank order — the standard BPE segmenter). */
  def segmentWord(word: String, merges: Seq[(String, String)])
      : Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    merges.foreach { case (a, b) =>
      var i = 0
      val out = Vector.newBuilder[String]
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** Corpus-side tokenization with a broadcast merge table: per-row
    * imperative segmenter work via `mapPartitions` (the sequential-
    * kernel idiom the media codecs use — no UDF), narrow, zero
    * shuffles. Output: (idCol, textCol, bpe_tokens, n_bpe_tokens). */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val bc = df.sparkSession.sparkContext.broadcast(merges)
    val in = df.select(col(idCol), col(textCol))
    val schema = StructType(in.schema.fields ++ Seq(
      StructField("bpe_tokens", ArrayType(StringType, containsNull = false)),
      StructField("n_bpe_tokens", IntegerType, nullable = false)))
    in.mapPartitions { it =>
      val re = "[^a-z0-9]+".r
      // per-partition memo: segmentation is a pure function of the word,
      // and corpus word streams are Zipfian — the distinct-word set a
      // partition sees is tiny next to its token count, so caching turns
      // O(tokens · merges) segmenter work into O(vocab · merges)
      val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
      it.map { r =>
        val t = r.getAs[String](1)
        val toks =
          if (t == null) Seq.empty[String]
          else re.split(t.toLowerCase).toSeq.filter(_.nonEmpty)
            .flatMap(w =>
              memo.getOrElseUpdate(w, segmentWord(w, bc.value)))
        Row.fromSeq(r.toSeq :+ toks :+ toks.length)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
