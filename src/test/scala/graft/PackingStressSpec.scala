package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Cross-config stress gate for the packing manifest (VERDICT r4 item 1c):
  * the two-level prefix sum must be byte-identical across shuffle-partition
  * counts {2, 16, 200}, AQE on/off, and repeated runs inside one JVM —
  * the exact axes along which the driver harness differs from the local
  * gate. The manifest's bucket id is a pure function of the data (quantile
  * boundaries embedded as literals), so every combination must agree.
  */
class PackingStressSpec extends SparkSpec {

  private def docs = {
    val rows = Seq.tabulate(500) { i =>
      (i.toLong, if (i % 23 == 0) ""
        else (0 until (i % 37)).map(j => s"w${i}_$j").mkString(" "),
        s"src${i % 3}")
    }
    spark.createDataFrame(rows).toDF("doc_id", "text", "source")
  }

  test("packManifest is byte-identical across shuffle-partition counts, " +
      "AQE on/off, and repeated runs in one JVM") {
    val df = docs
    def canon(): Seq[Seq[Any]] =
      Packing.packManifest(df, "doc_id", "text", seqLen = 64)
        .orderBy("doc_id").collect().map(_.toSeq.toVector).toVector
    def canonGrouped(): Seq[Seq[Any]] =
      Packing.packManifest(df, "doc_id", "text", seqLen = 64,
          groupCol = Some("source"))
        .orderBy("doc_id").collect().map(_.toSeq.toVector).toVector

    val conf = spark.conf
    val origParts = conf.get("spark.sql.shuffle.partitions")
    val origAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      val ref = canon()
      val refG = canonGrouped()
      assert(ref.size == 500 && refG.size == 500)
      for {
        p <- Seq("2", "16", "200")
        aqe <- Seq("true", "false")
        rep <- 1 to 2
      } {
        conf.set("spark.sql.shuffle.partitions", p)
        conf.set("spark.sql.adaptive.enabled", aqe)
        assert(canon() == ref,
          s"manifest divergence at parts=$p aqe=$aqe rep=$rep")
        assert(canonGrouped() == refG,
          s"grouped manifest divergence at parts=$p aqe=$aqe rep=$rep")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", origParts)
      conf.set("spark.sql.adaptive.enabled", origAqe)
    }
  }

  test("packSequences text digests are invariant to shuffle-partition count") {
    val df = docs
    def digests(): Map[Long, String] =
      Packing.packSequences(df, "doc_id", "text", seqLen = 64)
        .select(col("seq_id"), md5(col("seq_text")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val conf = spark.conf
    val origParts = conf.get("spark.sql.shuffle.partitions")
    try {
      val ref = digests()
      for (p <- Seq("2", "200")) {
        conf.set("spark.sql.shuffle.partitions", p)
        assert(digests() == ref, s"seq_text divergence at parts=$p")
      }
    } finally conf.set("spark.sql.shuffle.partitions", origParts)
  }
}
