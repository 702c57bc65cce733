package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — the
  * training-data-pipeline ANN surface (BASELINE.json north star).
  *
  * Tiering:
  *  - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline.
  *    Queries are broadcast; the corpus is scanned once; per-partition
  *    codegen'd `zip_with`/`aggregate` dot products; a window top-k per
  *    query. Cost O(|Q|·|corpus|·dim) — right when |Q| is small or the
  *    corpus fits a single scan budget.
  *  - [[lshCandidates]]/[[lshTopK]] — sign-random-projection LSH: each
  *    vector hashes to a `planes`-bit bucket; candidates = same bucket.
  *    The scale path: bucket join instead of cross product, recall tuned
  *    by plane count / multi-probe. Hyperplanes are generated from a fixed
  *    seed so plans are deterministic across runs and executors (they ride
  *    into the plan as literals — no RNG at execution time).
  *
  * All arithmetic is double (explicit upcast from float32) with a
  * sequential left-fold, so results are reproducible and oracle-matchable.
  */
object Similarity {

  /** float32 array → double array (explicit, so FP math is double-precision
    * everywhere — float accumulation drifts and is engine-dependent). */
  def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: for each query row, the k nearest corpus rows
    * (excluding self-matches on id equality). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("match_id"),
      asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("match_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "match_id", "cosine")
  }

  /** Deterministic hyperplanes: planes × dim doubles in [-1, 1] from a
    * fixed-seed PRNG (seed 42, matching the corpus generator's ethos). */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-random-projection bucket id (one int, `planes` bits). */
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val pl = typedlit(p.toSeq)
      when(dot(vec, pl) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` cells by
    * nearest centroid, probe the `nprobe` cells nearest each query, exact
    * cosine + top-k within probed cells — the classic IVF-Flat shape
    * (cells ≈ n/nlist vectors; work per query drops from O(n) to
    * O(nprobe·n/nlist + nlist)). Centroids here are SAMPLED
    * deterministically (the first `nlist` corpus vectors) rather than
    * k-means-trained: same structure and plan shape, lower recall,
    * fully reproducible and oracle-checkable; swapping in trained
    * centroids changes only the centroid frame.
    *
    * Scale: cell assignment is a broadcast of nlist centroids against one
    * corpus scan; the probe join is keyed on the cell id (shuffle on
    * O(queries·nprobe) vs corpus cells), never an all-pairs product. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val cents = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).cast("long").as("cell"), asDouble(col(vecCol)).as("centv"))
    def assign(df: DataFrame, id: String, v: String, keep: Int): DataFrame = {
      val scored = df.select(col(id), asDouble(col(v)).as("__v"))
        .crossJoin(broadcast(cents))
        .withColumn("__sim", cosine(col("__v"), col("centv")))
      val w = Window.partitionBy(id).orderBy(col("__sim").desc, col("cell").asc)
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= keep)
        .select(col(id), col("cell"), col("__v"))
    }
    val corpusCells = assign(corpus, idCol, vecCol, 1)
      .select(col(idCol).as("match_id"), col("cell"), col("__v").as("cv"))
    val queryProbes = assign(queries, idCol, vecCol, nprobe)
      .select(col(idCol).as("query_id"), col("cell"), col("__v").as("qv"))
    val scored = corpusCells.join(broadcast(queryProbes), "cell")
      .filter(col("query_id") =!= col("match_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "match_id", "cosine")
  }

  /** Embedding-cosine near-dup dedup — the vector analog of
    * [[Dedup.lshDedup]]: SRP-bucket the corpus (seeded hyperplanes →
    * deterministic plan literals), candidate pairs share a bucket (a
    * bucket join, never all-pairs), verify at cosine ≥ τ, drop the larger
    * id of each verified pair (keep-min). Recall follows the SRP bucket
    * structure: near-identical vectors agree on every sign bit with high
    * probability, so true duplicates rarely escape; `planes` trades
    * recall vs bucket size. */
  def cosineDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      tau: Double, planes: Int, dim: Int): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val keyed = corpus.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("__bucket", srpBucket(col("__v"), hp))
    val removed = keyed.as("a")
      .join(keyed.as("b"),
        col("a.__bucket") === col("b.__bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .filter(cosine(col("a.__v"), col("b.__v")) >= tau)
      .select(col(s"b.$idCol").as(idCol))
      .distinct()
    corpus.join(removed, Seq(idCol), "left_anti")
  }

  /** LSH-bucketed ANN: join queries to corpus on equal SRP bucket, then
    * exact cosine + top-k within candidates. Recall < 1 by construction;
    * `planes` trades recall vs bucket size (n/2^planes expected). */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int, dim: Int): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket_id", srpBucket(col("qv"), hp))
    val c = corpus.select(col(idCol).as("match_id"),
      asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket_id", srpBucket(col("cv"), hp))
    val scored = c.join(broadcast(q), "bucket_id")
      .filter(col("query_id") =!= col("match_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "match_id", "cosine")
  }
}
