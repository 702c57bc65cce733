package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One stage of a staged corpus build: a name and a DataFrame
  * transform. The runner materializes every stage, so `run` sees its
  * input as a plain parquet scan — never a lineage chain back through
  * earlier stages. */
final case class PipelineStage(name: String, run: DataFrame => DataFrame)

/** Staged corpus-build runner — the orchestration a real pipeline
  * (normalize → dedup → quality → mix → pack → publish) needs when
  * stage 5 of 7 dies at hour 30: every stage CHECKPOINTS to its own
  * parquet directory with a publishing manifest
  * ([[CorpusStats.manifest]]: per-shard doc/char counts + an
  * order-independent content checksum) and a completion marker, and a
  * rerun resumes from the last green stage instead of recomputing the
  * corpus-sized prefix.
  *
  * Layout under `dir`, one subdirectory per stage (`stage<i>_<name>`):
  *  - `data` — the stage's full output rows (the next stage's input);
  *  - `manifest` — the stage's [[CorpusStats.manifest]] rows, tagged
  *    with the stage label (what an auditor diffs between corpus
  *    versions, and what the correctness gate pins);
  *  - `_STAGE_OK` — completion marker, written LAST, so a stage killed
  *    mid-write is visibly incomplete and reruns.
  *
  * Resume contract: the COMPLETED PREFIX is skipped (its last `data`
  * artifact is read back); the first stage without a marker and
  * everything after it run. Markers past the first gap are deleted
  * up front — a downstream marker can only describe output computed
  * from a stale upstream, and resuming "around" a hole would silently
  * publish mixed corpus versions.
  *
  * The INPUT is fingerprinted too (`input_manifest/`, the same
  * [[CorpusStats.manifest]] rows, `_OK`-marked): a green prefix is
  * only green FOR THE INPUT IT WAS COMPUTED FROM, so a rerun whose
  * input manifest differs from the stored one invalidates every
  * marker and rebuilds from stage 0 — without this, resume would
  * silently reuse stage outputs computed from a different corpus.
  * Crash ordering is deletions-first: stale markers are removed
  * BEFORE the new input manifest is written, so dying between the
  * two leaves no marker (full rerun), never a fresh manifest over
  * stale stages. The fingerprint pass is one extra distributed scan
  * of the input per invocation — the price of a resume that cannot
  * lie.
  *
  * Scale shape: the runner adds one parquet write + one
  * manifest aggregate per stage — both distributed, both O(stage
  * output); nothing collects. The write is the point: it is the
  * restart boundary, and it breaks lineage so no stage's failure
  * re-triggers earlier stages' work (the same reason the incremental
  * dedup family checkpoints between rounds). */
object PipelineRunner {

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def stageDir(dir: String, i: Int, s: PipelineStage): String =
    s"$dir/stage${i}_${s.name}"

  private def ok(spark: SparkSession, sd: String): Boolean =
    fs(spark, sd).exists(new org.apache.hadoop.fs.Path(s"$sd/_STAGE_OK"))

  /** Run `stages` over `input`, checkpoint + manifest each, resume
    * from the last green stage. Returns the FINAL stage's output (read
    * back from its own artifact — callers compose onto a scan, not a
    * lineage chain). `idCol`/`textCol` feed the per-stage manifest;
    * every stage's output must carry both. */
  def run(input: DataFrame, stages: Seq[PipelineStage], dir: String,
      idCol: String, textCol: String, shards: Int = 8): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val spark = input.sparkSession
    // pin the input ONCE (the appendShards convention): the fingerprint
    // below and the frame stage 0 consumes must be the SAME rows, or a
    // nondeterministic input could record green markers whose stored
    // fingerprint describes rows stage 0 never saw. LAZY checkpoint:
    // the manifest collect below materializes it as a side effect, so
    // the corpus is scanned exactly once even on a green-prefix resume
    // (an eager checkpoint would add a full extra pass)
    val pinned = input.localCheckpoint(false)
    // fingerprint the input: stored manifest rows must match what the
    // caller is passing NOW, or every green marker describes output of
    // a different corpus and the whole prefix is stale
    val imDir = s"$dir/input_manifest"
    val imOk = new org.apache.hadoop.fs.Path(s"$imDir/_OK")
    // null-tolerant extraction on BOTH sides (an all-null textCol
    // shard sums n_chars/checksum to NULL; getAs unboxes that to 0 —
    // consistent, so equality still discriminates)
    def rows4(rs: Array[org.apache.spark.sql.Row])
        : Set[(Long, Long, Long, Long)] =
      rs.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("checksum"))).toSet
    val inputRows = rows4(
      CorpusStats.manifest(pinned, idCol, textCol, shards)
        .select("shard", "n_docs", "n_chars", "checksum").collect())
    val inputMatches = fs(spark, imDir).exists(imOk) &&
      (try rows4(spark.read.parquet(imDir)
          .select("shard", "n_docs", "n_chars", "checksum").collect())
          == inputRows
      catch { case _: Exception => false })
    // longest completed prefix; every marker past the first gap is
    // stale by definition — and with a changed input, ALL of them are
    val firstGap =
      if (!inputMatches) 0
      else stages.indices
        .find(i => !ok(spark, stageDir(dir, i, stages(i))))
        .getOrElse(stages.length)
    stages.indices.drop(firstGap).foreach { i =>
      val sd = stageDir(dir, i, stages(i))
      fs(spark, sd).delete(
        new org.apache.hadoop.fs.Path(s"$sd/_STAGE_OK"), false)
    }
    if (!inputMatches) {
      // markers are gone (above) — now it is safe to record the new
      // input; a crash between delete and write just means full rerun.
      // Written from the ALREADY-COLLECTED rows, not a re-execution of
      // the manifest plan: the recorded fingerprint is exactly the one
      // that was compared (a nondeterministic input can't slip a
      // different manifest into storage), and the input is scanned
      // once, as priced above.
      fs(spark, imDir).delete(imOk, false)
      import spark.implicits._
      inputRows.toSeq.sortBy(_._1)
        .toDF("shard", "n_docs", "n_chars", "checksum")
        .coalesce(1).write.mode("overwrite").parquet(imDir)
      fs(spark, imDir).create(imOk, true).close()
    }
    var current =
      if (firstGap == 0) pinned
      else spark.read.parquet(
        s"${stageDir(dir, firstGap - 1, stages(firstGap - 1))}/data")
    for (i <- firstGap until stages.length) {
      val sd = stageDir(dir, i, stages(i))
      stages(i).run(current)
        .write.mode("overwrite").parquet(s"$sd/data")
      val data = spark.read.parquet(s"$sd/data")
      CorpusStats.manifest(data, idCol, textCol, shards)
        .select(lit(s"stage${i}_${stages(i).name}").as("stage"),
          col("shard"), col("n_docs"), col("n_chars"), col("checksum"))
        .write.mode("overwrite").parquet(s"$sd/manifest")
      fs(spark, sd).create(
        new org.apache.hadoop.fs.Path(s"$sd/_STAGE_OK"), true).close()
      current = data
    }
    spark.read.parquet(
      s"${stageDir(dir, stages.length - 1, stages.last)}/data")
  }

  /** Every completed stage's manifest rows under `dir`, one frame —
    * the per-stage audit trail a corpus build publishes. */
  def manifests(spark: SparkSession, dir: String,
      stages: Seq[PipelineStage]): DataFrame =
    stages.indices
      .filter(i => ok(spark, stageDir(dir, i, stages(i))))
      .map(i => spark.read.parquet(
        s"${stageDir(dir, i, stages(i))}/manifest"))
      .reduceOption(_.unionByName(_))
      .getOrElse {
        // zero completed stages: an EMPTY audit trail, not a throw
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("stage", StringType),
            StructField("shard", LongType), StructField("n_docs", LongType),
            StructField("n_chars", LongType),
            StructField("checksum", LongType))))
      }
}
