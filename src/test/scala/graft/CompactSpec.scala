package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{Compact, Publish}

/** Incremental publish ([[Publish.appendShards]]) + small-file
  * compaction ([[Compact.compactShards]]): appends must merge the
  * manifest exactly (the checksum is additive mod 10¹⁸, so stored +
  * delta equals the full recompute), accretion must actually fragment
  * files, and compaction must cut the file count while moving zero
  * rows — verifyShards stays empty against the UNCHANGED manifest on
  * both sides of the rewrite.
  */
class CompactSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables
    .load(spark, "/root/testdata/sf0.001", "documents")

  private def filesPerShard(dir: String): Map[Int, Int] = {
    val data = new org.apache.hadoop.fs.Path(s"$dir/data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(data).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .map(d => d.getPath.getName.stripPrefix("shard=").toInt ->
        fs.listStatus(d.getPath).count(f =>
          f.isFile && !f.getPath.getName.startsWith("_")))
      .toMap
  }

  test("appendShards merges the manifest exactly and only appends files") {
    val dir = Files.createTempDirectory("compact-append").toString
    val base = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    Publish.writeShards(base, "doc_id", "text", dir, shards = 4)
    val f0 = filesPerShard(dir)
    Publish.appendShards(docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "text", dir)
    Publish.appendShards(docs.filter(pmod(col("doc_id"), lit(3)) === 2),
      "doc_id", "text", dir)
    val f1 = filesPerShard(dir)
    // accretion: every populated shard gained files, none was rewritten
    assert(f1.values.sum > f0.values.sum)
    f0.foreach { case (sh, n) => assert(f1(sh) >= n) }
    // stored manifest after two appends == the single-writer recompute
    assert(Publish.verifyShards(spark, dir, "doc_id", "text").isEmpty)
    // data content == the full corpus, row for row
    val readBack = spark.read.parquet(s"$dir/data").drop("shard", "pos")
    assert(graft.operators.CorpusStats
      .corpusDiff(docs, readBack, "doc_id", "text")
      .filter(col("status") =!= "unchanged").isEmpty)
    // within-shard pos stays a unique read-order key across batches
    val dup = spark.read.parquet(s"$dir/data")
      .groupBy("shard", "pos").count().filter(col("count") > 1)
    assert(dup.isEmpty)
  }

  test("compactShards cuts file count, preserves bytes, keeps the manifest") {
    val dir = Files.createTempDirectory("compact-run").toString
    Publish.writeShards(docs.filter(pmod(col("doc_id"), lit(4)) === 0),
      "doc_id", "text", dir, shards = 4)
    (1 to 3).foreach(i => Publish.appendShards(
      docs.filter(pmod(col("doc_id"), lit(4)) === i), "doc_id", "text",
      dir): Unit)
    val before = filesPerShard(dir)
    assert(before.values.forall(_ >= 3)) // genuinely fragmented
    val audit = Compact.compactShards(spark, dir, targetBytes = 64L << 20)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val after = filesPerShard(dir)
    // big target => exactly one file per shard, and the audit agrees
    after.foreach { case (sh, n) =>
      assert(n == 1, s"shard $sh")
      assert(audit(sh) == (before(sh).toLong, 1L))
    }
    // zero rows moved: the STORED manifest (untouched by compaction)
    // still matches a recompute from the rewritten bytes
    assert(Publish.verifyShards(spark, dir, "doc_id", "text").isEmpty)
    assert(graft.operators.CorpusStats
      .corpusDiff(docs, spark.read.parquet(s"$dir/data").drop("shard", "pos"),
        "doc_id", "text")
      .filter(col("status") =!= "unchanged").isEmpty)
    // no leftover swap dirs
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data_compacting")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data_precompact")))
  }

  test("compactShards self-heals the swap crash window (data gone, " +
      "data_precompact present) and still preserves content") {
    val dir = Files.createTempDirectory("compact-heal").toString
    Publish.writeShards(docs, "doc_id", "text", dir, shards = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a death between rename(data, old) and rename(tmp, data)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/data"),
      new org.apache.hadoop.fs.Path(s"$dir/data_precompact")))
    Compact.compactShards(spark, dir, targetBytes = 64L << 20)
    assert(Publish.verifyShards(spark, dir, "doc_id", "text").isEmpty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data_precompact")))
  }

  test("compactShards splits an oversized shard into multiple files") {
    val dir = Files.createTempDirectory("compact-split").toString
    Publish.writeShards(docs, "doc_id", "text", dir, shards = 2)
    val audit = Compact.compactShards(spark, dir, targetBytes = 8L << 10)
      .collect()
    val after = filesPerShard(dir)
    // tiny target: every shard bigger than a file's worth must split
    audit.foreach { r =>
      val (sh, bytes) = (r.getInt(0), r.getLong(3))
      val want = math.max(1L, (bytes + (8L << 10) - 1) / (8L << 10))
      if (want > 1) assert(after(sh) > 1, s"shard $sh want=$want")
    }
    assert(Publish.verifyShards(spark, dir, "doc_id", "text").isEmpty)
  }
}
