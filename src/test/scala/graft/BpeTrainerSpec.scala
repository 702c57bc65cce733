package graft

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.EndOfWord

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich-style corpus: low*5 lower*2 newest*6 widest*3
  private def corpus = Seq(
    Seq.fill(5)("low"), Seq.fill(2)("lower"),
    Seq.fill(6)("newest"), Seq.fill(3)("widest")
  ).flatten.mkString(" ")

  test("learnMerges reproduces the textbook merge sequence with lexicographic tie-breaks") {
    val df = Seq(corpus).toDF("text")
    val merges = BpeTrainer.learnMerges(df, "text", 4)
    // hand-derived: es(9) ties est/t</w> → lexicographic; then est,
    // est</w>, then l-o (7) beats o-w on tie
    assert(merges === Seq(
      ("e", "s"), ("es", "t"), ("est", EndOfWord), ("l", "o")))
  }

  test("segmentWord applies merges in rank order; unseen chars stay atomic") {
    val df = Seq(corpus).toDF("text")
    val merges = BpeTrainer.learnMerges(df, "text", 10)
    assert(BpeTrainer.segmentWord("lowest", merges).contains("est" + EndOfWord))
    // every output symbol concatenates back to the input word + </w>
    val segs = BpeTrainer.segmentWord("newest", merges)
    assert(segs.mkString === "newest" + EndOfWord)
    val unseen = BpeTrainer.segmentWord("zq", merges)
    assert(unseen === Seq("z", "q", EndOfWord))
  }

  test("tokenize (mapPartitions) ≡ local segmentation; token totals consistent") {
    val rows = Seq((1L, "low lower"), (2L, "newest widest newest"),
      (3L, null.asInstanceOf[String]))
    val df = rows.toDF("id", "text")
    val merges = BpeTrainer.learnMerges(
      Seq(corpus).toDF("text"), "text", 8)
    val got = BpeTrainer.tokenize(df, "id", "text", merges)
      .select("id", "bpe_tokens").as[(Long, Seq[String])]
      .collect().toMap
    rows.foreach { case (id, t) =>
      val exp =
        if (t == null) Seq.empty[String]
        else "[^a-z0-9]+".r.split(t.toLowerCase).toSeq.filter(_.nonEmpty)
          .flatMap(w => BpeTrainer.segmentWord(w, merges))
      assert(got(id) === exp, s"id=$id")
    }
    // reassembly: concatenated tokens spell the words back
    assert(got(2L).mkString === s"newest${EndOfWord}widest${EndOfWord}newest$EndOfWord")
  }

  test("maxVocab guard fails fast on id-shaped corpora with the remedy in the message") {
    val ids = (0 until 500).map(i => s"user$i token$i").mkString(" ")
    val df = Seq(ids).toDF("text")
    val e = intercept[IllegalArgumentException](
      BpeTrainer.learnMerges(df, "text", 2, maxVocab = 100))
    assert(e.getMessage.contains("maxVocab"))
  }

  test("learning plateaus stop early: more merges requested than pairs exist") {
    val df = Seq("ab ab ab").toDF("text")
    val merges = BpeTrainer.learnMerges(df, "text", 50)
    // "ab</w>" fully merges in 2 steps; the loop must stop, not spin
    assert(merges.size <= 3)
    assert(BpeTrainer.segmentWord("ab", merges) === Seq("ab" + EndOfWord))
  }
}
