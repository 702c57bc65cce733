package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for published shard-partitioned datasets —
  * the table-maintenance pass every long-lived 100 TB corpus needs.
  * Incremental publishes ([[graft.operators.Retrieval.updateIndex]]'s
  * append pattern, per-batch [[Publish.writeShards]] runs, streaming
  * sinks) accrete files far below the parquet sweet spot; a scan then
  * pays per-file open/footer costs and the scheduler pays per-split
  * overhead — at 1000 executors the file listing itself becomes a
  * driver bottleneck.
  *
  * Shape: one pass. Per-shard byte totals come from the driver-side
  * file listing (shard count rows, never data); each shard gets
  * `ceil(bytes / targetBytes)` output buckets; rows bucket by their
  * stable within-shard `pos` (so the rewrite is deterministic and
  * re-runnable), ONE `repartitionByRange(shard, bucket)` co-locates
  * each output file's rows, and the writer rewrites `data/` via a
  * tmp-dir + rename swap (readers of the old layout are never half
  * over-written; the swap window is two FS renames). Content is
  * untouched — [[Publish.verifyShards]] against the UNCHANGED stored
  * manifest is the post-condition, spec-pinned and driver-gated
  * (q_compact returns the recomputed manifest of the compacted data).
  *
  * Range (not hash) partitioning on (shard, bucket): hash would fold
  * distinct buckets of one shard into one task/file (under-splitting
  * hot shards) exactly when compaction matters; range with
  * `shards × maxBuckets`-capped partition count keeps each output
  * bucket a contiguous slice. AQE may still coalesce tiny adjacent
  * ranges — fewer, larger files, which is the goal, never the failure
  * direction.
  */
object Compact {

  /** Compact `dir/data` (a [[Publish.writeShards]] layout) so every
    * shard's files are ~`targetBytes`. Returns the per-shard audit:
    * `(shard, files_before, files_after, bytes)`. */
  def compactShards(spark: SparkSession, dir: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1L, "targetBytes must be >= 1")
    val data = new Path(s"$dir/data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery for the two-rename swap below: a death between
    // rename(data, old) and rename(tmp, data) leaves the corpus solely
    // at data_precompact — roll it back before doing anything, so a
    // re-run self-heals instead of failing on the missing data dir
    val oldP = new Path(s"$dir/data_precompact")
    if (!fs.exists(data) && fs.exists(oldP)) {
      require(fs.rename(oldP, data),
        s"recovery rename $oldP -> $data failed")
    }

    def listShardFiles(): Map[Int, Seq[(String, Long)]] =
      fs.listStatus(data).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
        .map { d =>
          val sh = d.getPath.getName.stripPrefix("shard=").toInt
          sh -> fs.listStatus(d.getPath).toSeq
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            .map(f => (f.getPath.toString, f.getLen))
        }.toMap

    val before = listShardFiles()
    val plan = before.toSeq.map { case (sh, files) =>
      val bytes = files.map(_._2).sum
      (sh, files.size, bytes,
        math.max(1L, (bytes + targetBytes - 1) / targetBytes))
    }
    import spark.implicits._
    val planDf = plan.map { case (sh, _, _, nOut) => (sh, nOut) }
      .toDF("shard", "__n_out")

    val df = spark.read.parquet(data.toString)
    val totalBuckets = plan.map(_._4).sum
    // loud, not wrapped: a silent Int overflow would either funnel the
    // corpus into one partition (negative wrap masked by max(1)) or ask
    // for billions of partitions
    require(totalBuckets <= Int.MaxValue.toLong,
      s"compaction plan wants $totalBuckets output buckets (> Int.Max) — " +
        s"raise targetBytes ($targetBytes) for this corpus size")
    val nParts = totalBuckets.toInt.max(1)
    val tmp = new Path(s"$dir/data_compacting")
    fs.delete(tmp, true)
    df.join(broadcast(planDf), Seq("shard"))
      .withColumn("__bucket", pmod(col("pos"), col("__n_out")))
      .drop("__n_out")
      .repartitionByRange(nParts, col("shard"), col("__bucket"))
      .drop("__bucket")
      .write.mode("overwrite").partitionBy("shard").parquet(tmp.toString)

    // swap: the old layout stays readable until one rename flips it
    val old = new Path(s"$dir/data_precompact")
    fs.delete(old, true)
    require(fs.rename(data, old), s"rename $data -> $old failed")
    require(fs.rename(tmp, data), s"rename $tmp -> $data failed")
    fs.delete(old, true)

    val after = listShardFiles()
    plan.map { case (sh, nBefore, bytes, _) =>
      (sh, nBefore.toLong, after.get(sh).map(_.size).getOrElse(0).toLong,
        bytes)
    }.toDF("shard", "files_before", "files_after", "bytes")
  }
}
