package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trained text-quality classifier — the CCNet/GPT-3-style "does this
  * document look like the reference corpus" gate, as a LINEAR model
  * trained distributed by full-batch gradient descent over cheap
  * deterministic text features. The reference engine trains per-series
  * anomaly models (loudml/donut.py); a corpus-level quality model is
  * part of the training-data-pipeline surface this library adds.
  *
  * Transfer function: the Elliott sigmoid (Elliott 1993, "A better
  * activation function for artificial neural networks")
  *
  *   p(z) = 0.5 + 0.5 · z / (1 + |z|)
  *
  * chosen over the logistic 1/(1+e^{-z}) DELIBERATELY: it is built
  * from add/divide/abs only, every one of which is a correctly-rounded
  * IEEE-754 operation, so the whole forward pass and training loop are
  * BIT-IDENTICAL across engines (JVM `Math.exp` is permitted 1 ulp of
  * slack and is not guaranteed to match another engine's libm — with
  * 10⁵+ sigmoid evaluations per training replay, a single divergent
  * ulp near a rounding boundary would break the differential gate; the
  * same reasoning picked the A&S polynomial for
  * [[graft.functions.Stats.erf]]).
  *
  * Training rule (perceptron-form gradient, T full-batch steps):
  *
  *   w ← w − η/n · Σ_rows (p(w·x) − y) · x
  *
  * Determinism contract: each per-row term routes through
  * decimal(30,12) before the sum (order-free exact accumulation — the
  * BM25 convention), the gradient returns to double once, and the
  * weight update is a fixed-order scalar chain — so the full weight
  * TRAJECTORY is replayable bit-exact by another engine folding the
  * same rule (the q_holtwinters / q_bpe_learned recursive-CTE
  * precedent).
  *
  * Scale shape at 100 TB: the featurized projection (6 doubles + label
  * per doc) is computed ONCE from a narrow codegen'd scan and
  * persisted; each GD step is one map-side-combined aggregation over
  * it (7 partial sums — bytes per partition on the wire), and weights
  * live driver-side (model-sized, 6 doubles). T passes over a cached
  * 56-byte-per-row projection — no parameter servers, no per-row
  * shuffles, no driver-side data.
  */
object TextClassifier {

  /** Stopword vocabulary for the stopword-ratio feature (fixed,
    * case-sensitive — lowercase corpus convention). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** The five text features (all in [0, 1], all exact-arithmetic
    * ratios — each a single IEEE division of exactly-computed counts):
    * length signal, punctuation density, mean-token-length signal,
    * digit density, stopword ratio. Index 0 is the bias slot. */
  def features(text: Column): Seq[Column] = {
    val toks = regexp_count(text, lit("[A-Za-z0-9]+")).cast("double")
    val chars = length(text).cast("double")
    val punct =
      (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
        .cast("double")
    val spaces =
      (length(text) - length(replace(text, lit(" "), lit(""))))
        .cast("double")
    val digits =
      (length(text) - length(regexp_replace(text, "[0-9]", "")))
        .cast("double")
    val stops = size(filter(
      regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0)),
      t => t.isin(Stopwords: _*))).cast("double")
    Seq(
      least(toks / lit(50.0), lit(1.0)),
      punct / greatest(chars, lit(1.0)),
      least((chars - spaces) / greatest(toks, lit(1.0)) / lit(8.0),
        lit(1.0)),
      digits / greatest(chars, lit(1.0)),
      stops / greatest(toks, lit(1.0)))
  }

  val NumFeatures: Int = 5 // + bias ⇒ 6 weights

  /** Trained model: final weights (bias first) and the full per-step
    * trajectory — step 0 is the zero init, step `iters` the final. */
  final case class GdModel(trajectory: IndexedSeq[Array[Double]]) {
    def weights: Array[Double] = trajectory.last
    def iters: Int = trajectory.size - 1
  }

  /** Forward pass with `w` as plan literals (bias first): a narrow
    * codegen'd expression, zero shuffles — rides the corpus scan. The
    * dot product folds LEFT-TO-RIGHT from the bias (the replayable
    * accumulation order; float addition does not reassociate in either
    * engine's planner). */
  def score(text: Column, w: Array[Double]): Column = {
    require(w.length == NumFeatures + 1, s"need ${NumFeatures + 1} weights")
    val terms = lit(w(0)) +: features(text).zipWithIndex.map {
      case (f, i) => lit(w(i + 1)) * f
    }
    val z = terms.reduceLeft(_ + _)
    lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))
  }

  /** Full-batch GD fit. `label` must evaluate to 0.0/1.0 doubles.
    * One Spark job per step (a 7-value aggregate over the persisted
    * featurized projection); weights stay driver-side. */
  def fit(df: DataFrame, textCol: String, label: Column,
      iters: Int = 12, lr: Double = 0.5): GdModel = {
    require(iters >= 1, "iters must be >= 1")
    val fcols = features(col(textCol)).zipWithIndex.map {
      case (f, i) => f.as(s"f${i + 1}")
    }
    val feats = df.select(lit(1.0).as("f0") +: fcols :+
      label.cast("double").as("y"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d1 = NumFeatures + 1
      var w = Array.fill(d1)(0.0)
      val traj = IndexedSeq.newBuilder[Array[Double]]
      traj += w.clone()
      var t = 0
      while (t < iters) {
        // z folds left-to-right from the bias term, matching [[score]]
        val z = (0 until d1)
          .map(j => lit(w(j)) * col(s"f$j"))
          .reduceLeft(_ + _)
        val p = lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))
        val r = p - col("y")
        val aggs = (0 until d1).map(j =>
          sum((r * col(s"f$j")).cast("decimal(30,12)")).cast("double")
            .as(s"g$j")) :+ count(lit(1)).as("n")
        val row = feats.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getLong(d1).toDouble
        w = Array.tabulate(d1)(j => w(j) - lr * row.getDouble(j) / n)
        traj += w.clone()
        t += 1
      }
      GdModel(traj.result())
    } finally feats.unpersist()
  }

  /** The trajectory as a frame `(iter, i, weight)` — the differential
    * artifact a replaying engine can verify step by step. */
  def trajectoryDf(spark: SparkSession, model: GdModel): DataFrame = {
    val rows = model.trajectory.zipWithIndex.flatMap { case (w, it) =>
      w.zipWithIndex.map { case (v, i) => Row(it, i, v) }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("iter", IntegerType, nullable = false),
        StructField("i", IntegerType, nullable = false),
        StructField("weight", DoubleType, nullable = false))))
  }
}
