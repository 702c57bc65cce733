package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stats

/** Windowed-reconstruction model — the Donut-class second model behind the
  * [[ModelType]] seam, targeting the reference's test-enforced quality
  * floors (/root/reference/tests/test_donut.py): anomaly F1 ≥ 0.75 on the
  * randevents-style synthetic (:532-584) and gap imputation ≈ target ±0.22
  * (:451-530) — floors the pure per-slot seasonal baseline cannot meet
  * (a bucket whose seasonal slot is missing from ALL training days has no
  * profile entry; only window context can reconstruct it).
  *
  * Where the reference's VAE (/root/reference/loudml/donut.py:102-163)
  * reconstructs each span-window nonlinearly, this model reconstructs
  * bucket t linearly from a window-feature basis:
  *
  *   x̂_t = w · [1, x_{t-1..t-L},  x_{t-P}, x_{t-2P},  μ_slot(t)]
  *
  * with P = period/interval (phase-aligned lags: same time yesterday /
  * two days ago) and μ_slot the per-slot train mean. Missing context is
  * imputed deterministically (the MCMC-imputation analog,
  * /root/reference/loudml/donut.py:1264-1296): a missing lag falls back to
  * that lag's OWN slot mean, then to the global mean. Weights are fit by
  * closed-form ridge (normal equations; intercept unregularized) — one
  * distributed aggregation pass builds XᵀX/Xᵀy (map-side partials, k ≤ 10
  * so the driver solve is k³ trivial), a second pass measures residual σ.
  * Deterministic: no iterative solver, no RNG.
  *
  * Why this passes the F1 floor where plain AR fails: an AR(L) model
  * adapts to a level-shift anomaly within L buckets (contaminated lags
  * drag x̂ up, residuals vanish). Here the phase-aligned lags and slot
  * mean stay clean for the whole anomaly (anomalies are shorter than a
  * period), so the reconstruction keeps tracking "normal" and residuals
  * stay large — the same property Donut gets from projecting onto the
  * learned normal manifold.
  *
  * Scale: slot profile = one tiny groupBy; lag features = one window pass
  * (single series ⇒ one ordered partition, same as the reference's 1-D
  * series; per-series keys would partition the window); XᵀX = one agg.
  * Predict is a broadcast profile join + window lags + a codegen'd dot
  * product — no UDFs, no collect of data-scale frames.
  */
object WindowReconstructor extends ModelType {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  val name = "window_reconstructor"

  final case class Params(
      bucketInterval: Long,
      period: Long = 86400L,
      localLags: Int = 3,
      ridgeLambda: Double = 0.1,
      sigmaFloor: Double = 1e-9) {
    def periodBuckets: Int = (period / bucketInterval).toInt
    def json: String =
      s"""{"type":"$name","bucket_interval":$bucketInterval,"period":$period,""" +
        s""""local_lags":$localLags,"ridge_lambda":$ridgeLambda,""" +
        s""""sigma_floor":$sigmaFloor}"""
  }

  private def jNum(j: JValue): Option[Double] = j match {
    case JInt(x)     => Some(x.toDouble)
    case JLong(x)    => Some(x.toDouble)
    case JDouble(x)  => Some(x)
    case JDecimal(x) => Some(x.toDouble)
    case _           => None
  }

  def parseParams(json: String): Params = {
    val j = JsonMethods.parse(json)
    Params(
      bucketInterval = jNum(j \ "bucket_interval")
        .getOrElse(throw new IllegalArgumentException(
          "window_reconstructor settings need bucket_interval")).toLong,
      period = jNum(j \ "period").getOrElse(86400.0).toLong,
      localLags = jNum(j \ "local_lags").getOrElse(3.0).toInt,
      ridgeLambda = jNum(j \ "ridge_lambda").getOrElse(0.1),
      sigmaFloor = jNum(j \ "sigma_floor").getOrElse(1e-9))
  }

  /** Lag features with deterministic imputation AND context sanitization:
    * a lag value outside its own slot's normal band (|v − μ_slot| >
    * 3σ_slot) is REPLACED by the slot mean before it enters the basis; a
    * missing lag likewise falls back to its slot mean, then to the global
    * mean. Replacement (not clamping) is the deterministic analog of
    * Donut's MCMC imputation + manifold projection
    * (/root/reference/loudml/donut.py:1264-1296), which resamples
    * abnormal/missing window entries from the learned normal
    * distribution: an anomalous bucket in the context cannot poison the
    * reconstruction of the buckets after it — without this, a level-shift
    * anomaly drags x̂ up within L buckets and the episode never closes
    * (clamping to the band edge still leaves ~σ-scale contamination,
    * enough to hold the score above min_threshold ≈ 1σ). Requires a
    * spine-complete series (every interval present — TimesQuery output). */
  private def featureCols(valueCol: String, p: Params, globalMean: Double,
      seriesKeys: Seq[String] = Nil): Seq[(String, Column)] = {
    // per-series windows: lags never cross a series boundary, and the
    // sort is per-partition, not global — the multi-series 100 TB shape
    val w =
      if (seriesKeys.isEmpty) Window.orderBy("bucket")
      else Window.partitionBy(seriesKeys.map(col): _*).orderBy("bucket")
    val P = p.periodBuckets
    def filledLag(i: Int, alias: String): (String, Column) = {
      val v = lag(col(valueCol), i).over(w)
      val m = lag(col("__sm"), i).over(w)
      val s = lag(col("__sig"), i).over(w)
      val sane = when(v.isNull || abs(v - m) > lit(3.0) * s, m).otherwise(v)
      alias -> coalesce(sane, lit(globalMean))
    }
    Seq("__one" -> lit(1.0)) ++
      (1 to p.localLags).map(i => filledLag(i, s"__lag_$i")) ++
      Seq(filledLag(P, "__seas_1"), filledLag(2 * P, "__seas_2")) ++
      Seq("__sm_t" -> col("__sm"))
  }

  /** Join the per-slot profile then add the feature basis columns. */
  private def assemble(bucketed: DataFrame, valueCol: String,
      profile: DataFrame, globalMean: Double, globalSigma: Double,
      p: Params, seriesKeys: Seq[String] = Nil): (DataFrame, Seq[String]) = {
    val withSm = bucketed
      .withColumn("__slot", SeasonalModel.slotCol(col("bucket"),
        SeasonalModelParams(p.bucketInterval, p.period)))
      .join(broadcast(profile.select(col("slot").as("__slot"),
        col("mu").as("__sm"), col("sigma").as("__sig"))), Seq("__slot"), "left")
      .withColumn("__sm", coalesce(col("__sm"), lit(globalMean)))
      .withColumn("__sig", coalesce(col("__sig"), lit(globalSigma)))
    val feats = featureCols(valueCol, p, globalMean, seriesKeys)
    val out = feats.foldLeft(withSm) { case (df, (n, c)) => df.withColumn(n, c) }
    (out, feats.map(_._1))
  }

  /** Solve (A + λI)w = b, intercept (index 0) unregularized; Gaussian
    * elimination with partial pivoting — k ≤ 10, driver-side. */
  private[ml] def ridgeSolve(a: Array[Array[Double]], b: Array[Double],
      lambda: Double): Array[Double] = {
    val k = b.length
    val m = Array.tabulate(k, k + 1) { (i, j) =>
      if (j == k) b(i)
      else a(i)(j) + (if (i == j && i > 0) lambda else 0.0)
    }
    for (piv <- 0 until k) {
      val best = (piv until k).maxBy(r => math.abs(m(r)(piv)))
      val t = m(piv); m(piv) = m(best); m(best) = t
      require(math.abs(m(piv)(piv)) > 1e-12, "singular normal equations")
      for (r <- piv + 1 until k) {
        val f = m(r)(piv) / m(piv)(piv)
        for (c <- piv to k) m(r)(c) -= f * m(piv)(c)
      }
    }
    val w = new Array[Double](k)
    for (i <- k - 1 to 0 by -1) {
      var s = m(i)(k)
      for (j <- i + 1 until k) s -= m(i)(j) * w(j)
      w(i) = s / m(i)(i)
    }
    w
  }

  /** Mergeable regression sufficient statistics — the reconstructor's
    * warm-start state (the `continue`-training analog,
    * /root/reference/loudml/donut.py:857-897): XᵀX (k×k), Xᵀy (k) and Σy²,
    * all plain sums, so `merge` is element-wise addition. Everything the
    * fit needs derives from them:
    *   weights = ridgeSolve(XᵀX, Xᵀy);
    *   RSS     = Σy² − 2wᵀ(Xᵀy) + wᵀ(XᵀX)w;
    *   Σr      = Σy − wᵀ(Σx)  (row 0 of XᵀX is Σx: feature 0 is the
    *             intercept; likewise (Xᵀy)₀ = Σy and XᵀX₀₀ = n);
    *   σ²_pop  = RSS/n − (Σr/n)².
    * EXACTNESS CONTRACT: stats merge exactly only against a FROZEN feature
    * basis (profile + global stats) — features embed slot means, so chunks
    * assembled with different profiles are sums over different bases. The
    * warm-start path therefore assembles new data with the trained model's
    * own profile ([[TrainedReconstructor.continueTraining]]). */
  final case class RegStats(a: Array[Array[Double]], b: Array[Double],
      syy: Double) {
    def k: Int = b.length
    def merge(o: RegStats): RegStats = {
      require(o.k == k, s"stats arity mismatch: ${o.k} vs $k")
      RegStats(
        Array.tabulate(k, k)((i, j) => a(i)(j) + o.a(i)(j)),
        Array.tabulate(k)(i => b(i) + o.b(i)),
        syy + o.syy)
    }
  }

  /** Normal-equation sums over a bucketed series assembled against the
    * given (frozen) basis — one distributed agg, map-side partials.
    * `targetFrom` excludes leading rows from the SUMS while still letting
    * them provide lag context (the chunked-training contract: a chunk
    * ships with 2·period of history, mirroring the predict path's context
    * extension, so its early targets see real lags — without it the
    * boundary rows impute to slot means and chunked sums drift from the
    * full-data sums). */
  private def regStats(bucketed: DataFrame, valueCol: String,
      profile: DataFrame, globalMean: Double, globalSigma: Double,
      p: Params, targetFrom: Option[Long] = None): RegStats = {
    val (feat, names) = assemble(bucketed, valueCol, profile, globalMean,
      globalSigma, p)
    val rows = targetFrom.foldLeft(feat.filter(col(valueCol).isNotNull))(
      (df, f) => df.filter(col("bucket") >= f))
    val k = names.length
    val prodAggs =
      (for (i <- 0 until k; j <- i until k)
        yield sum(col(names(i)) * col(names(j))).as(s"a_${i}_$j")) ++
      (0 until k).map(i => sum(col(names(i)) * col(valueCol)).as(s"b_$i")) :+
      sum(col(valueCol) * col(valueCol)).as("syy")
    val s = rows.agg(prodAggs.head, prodAggs.tail: _*).collect()(0)
    def d(n: String): Double =
      if (s.isNullAt(s.fieldIndex(n))) 0.0 else s.getDouble(s.fieldIndex(n))
    val a = Array.ofDim[Double](k, k)
    for (i <- 0 until k; j <- i until k) {
      val v = d(s"a_${i}_$j"); a(i)(j) = v; a(j)(i) = v
    }
    RegStats(a, Array.tabulate(k)(i => d(s"b_$i")), d("syy"))
  }

  /** Fit weights + residual σ purely from sufficient stats (no data
    * pass) — the warm-start solve. */
  private def fitFromStats(stats: RegStats, profile: DataFrame, p: Params,
      globalMean: Double, globalSigma: Double): TrainedReconstructor = {
    val weights = ridgeSolve(stats.a, stats.b, p.ridgeLambda)
    val n = stats.a(0)(0) // Σ(1·1)
    val k = stats.k
    val wAw = (for (i <- 0 until k; j <- 0 until k)
      yield weights(i) * stats.a(i)(j) * weights(j)).sum
    val wb = (0 until k).map(i => weights(i) * stats.b(i)).sum
    val rss = math.max(stats.syy - 2.0 * wb + wAw, 0.0)
    val sumR = stats.b(0) - (0 until k).map(i => weights(i) * stats.a(0)(i)).sum
    val varR = math.max(rss / n - (sumR / n) * (sumR / n), 0.0)
    val sigma = math.max(math.sqrt(varR), p.sigmaFloor)
    new TrainedReconstructor(profile, p, weights, sigma, globalMean,
      globalSigma, Some(stats))
  }

  def train(bucketed: DataFrame, valueCol: String, settingsJson: String): TrainedModel =
    train(bucketed, valueCol, parseParams(settingsJson))

  def train(bucketed: DataFrame, valueCol: String, p: Params): TrainedReconstructor = {
    // per-slot (μ, σ_pop) profile + global (μ, σ); slot σ bounds the
    // context-sanitization band, residual σ (below) sets the score bands
    val gRow = bucketed.agg(avg(col(valueCol)), stddev_pop(col(valueCol)))
      .collect()(0)
    val globalMean = if (gRow.isNullAt(0)) 0.0 else gRow.getDouble(0)
    val globalSigma = if (gRow.isNullAt(1)) 0.0 else gRow.getDouble(1)
    val profile = bucketed
      .groupBy(SeasonalModel.slotCol(col("bucket"),
        SeasonalModelParams(p.bucketInterval, p.period)))
      .agg(avg(col(valueCol)).as("mu"),
        coalesce(stddev_pop(col(valueCol)), lit(globalSigma)).as("sigma"))
      .filter(col("mu").isNotNull)
    val stats = regStats(bucketed, valueCol, profile, globalMean, globalSigma, p)
    val weights = ridgeSolve(stats.a, stats.b, p.ridgeLambda)

    // residual σ (population) over training targets — a direct data pass
    // (numerically safer than the stats identity when residuals are tiny
    // relative to Σy²; the warm-start path uses the identity)
    val (feat, names) = assemble(bucketed, valueCol, profile, globalMean,
      globalSigma, p)
    val rows = feat.filter(col(valueCol).isNotNull)
    val predExpr = names.zip(weights)
      .map { case (n, wi) => col(n) * lit(wi) }.reduce(_ + _)
    val sig = rows.agg(stddev_pop(col(valueCol) - predExpr)).collect()(0)
    val sigma = math.max(if (sig.isNullAt(0)) 0.0 else sig.getDouble(0), p.sigmaFloor)

    new TrainedReconstructor(profile, p, weights, sigma, globalMean,
      globalSigma, Some(stats))
  }

  def load(spark: SparkSession, profile: DataFrame, settingsJson: String): TrainedModel = {
    val j = JsonMethods.parse(settingsJson)
    val weights = (j \ "weights") match {
      case JArray(xs) => xs.flatMap(jNum).toArray
      case _ => throw new IllegalArgumentException("stored model has no weights")
    }
    val sigma = jNum(j \ "sigma").getOrElse(
      throw new IllegalArgumentException("stored model has no sigma"))
    val globalMean = jNum(j \ "global_mean").getOrElse(0.0)
    val globalSigma = jNum(j \ "global_sigma").getOrElse(0.0)
    new TrainedReconstructor(profile, parseParams(settingsJson), weights, sigma,
      globalMean, globalSigma)
  }

  final class TrainedReconstructor(
      val profile: DataFrame,
      val params: Params,
      val weights: Array[Double],
      val sigma: Double,
      val globalMean: Double,
      val globalSigma: Double,
      val regStats: Option[RegStats] = None) extends TrainedModel {

    def modelType: String = name

    /** Warm start (`continue` training, donut.py:857-897): fold NEW data
      * into the existing normal-equation sums and re-solve — old data is
      * never revisited. The new chunk is assembled against THIS model's
      * frozen basis (profile + global stats), which is what makes
      * merge exact: chunk₁-stats ⊕ chunk₂-stats ≡ full-data stats under
      * one basis (unit-tested to FP tolerance). Requires the model to
      * still carry stats (a freshly trained model does; a checkpoint
      * rehydrated without them cannot warm-start). */
    def continueTraining(newData: DataFrame, valueCol: String,
        targetFrom: Option[Long] = None): TrainedReconstructor = {
      val prev = regStats.getOrElse(throw new IllegalStateException(
        "model carries no sufficient stats; retrain from data"))
      val merged = prev.merge(
        WindowReconstructor.regStats(newData, valueCol, profile, globalMean,
          globalSigma, params, targetFrom))
      fitFromStats(merged, profile, params, globalMean, globalSigma)
    }

    /** Stats for an arbitrary chunk under THIS model's frozen basis —
      * lets callers accumulate chunks themselves (distributed collection
      * of per-partition stats, merged associatively). Ship each chunk
      * with 2·period of leading history and point `targetFrom` at the
      * chunk's own range start. */
    def statsFor(chunk: DataFrame, valueCol: String,
        targetFrom: Option[Long] = None): RegStats =
      WindowReconstructor.regStats(chunk, valueCol, profile, globalMean,
        globalSigma, params, targetFrom)

    /** Re-solve this model from explicit (possibly merged) stats, keeping
      * the frozen basis. */
    def withStats(stats: RegStats): TrainedReconstructor =
      fitFromStats(stats, profile, params, globalMean, globalSigma)

    def settingsJson: String = {
      val base = params.json.stripSuffix("}")
      s"""$base,"weights":[${weights.mkString(",")}],"sigma":$sigma,""" +
        s""""global_mean":$globalMean,"global_sigma":$globalSigma}"""
    }

    /** μ = w·features, bands μ ± 3σ (the reference's 3-sigma bands,
      * /root/reference/loudml/donut.py:1290-1296), score via
      * [[graft.functions.Stats.anomalyScore]]. The series should extend
      * `2·period` back past the scoring range so lags have context (the
      * reference extends by span−1, donut.py:1210-1217). */
    def predict(bucketed: DataFrame, valueCol: String,
        anomalyType: String = "low_high"): DataFrame =
      predictKeyed(bucketed, valueCol, anomalyType, Nil)

    /** Fleet scoring: one trained model over MANY series at once.
      * `seriesKeys` partition the lag windows, so context never leaks
      * across series and no global sort appears — each series scores as
      * if predicted alone (the series-independence invariant is
      * unit-tested). */
    def predictKeyed(bucketed: DataFrame, valueCol: String,
        anomalyType: String, seriesKeys: Seq[String]): DataFrame = {
      val (feat, names) = assemble(bucketed, valueCol, profile, globalMean,
        globalSigma, params, seriesKeys)
      val mu = names.zip(weights)
        .map { case (n, wi) => col(n) * lit(wi) }.reduce(_ + _)
      feat
        .withColumn("predicted", mu)
        .withColumn("lower", col("predicted") - lit(3.0 * sigma))
        .withColumn("upper", col("predicted") + lit(3.0 * sigma))
        .withColumn("score",
          Stats.anomalyScore(col(valueCol), col("predicted"), col("upper"),
            anomalyType))
        .drop((Seq("__slot", "__sm", "__sig") ++ names): _*)
    }

    /** Future bands: with no observations every lag imputes to its slot
      * mean, so x̂ depends only on slot — precompute the P slot
      * predictions driver-side (profile is model-sized) and broadcast-join
      * the spine. */
    def forecast(spark: SparkSession, from: Long, to: Long): DataFrame =
      forecastBands(spark, from, to, z = 3.0, noisePerStep = 0.0)

    /** CI-parameterized bands — see [[TrainedModel.forecastCI]]. */
    def forecastCI(spark: SparkSession, from: Long, to: Long,
        percentInterval: Double, percentNoise: Double): DataFrame =
      forecastBands(spark, from, to,
        z = Stats.normPpf(1.0 - (1.0 - percentInterval) / 2.0),
        noisePerStep = percentNoise * params.bucketInterval.toDouble / 86400.0)

    private def forecastBands(spark: SparkSession, from: Long, to: Long,
        z: Double, noisePerStep: Double): DataFrame = {
      import spark.implicits._
      val P = params.periodBuckets
      val sm: Map[Long, Double] = profile.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      def smOf(slot: Long): Double = sm.getOrElse(slot, globalMean)
      val perSlot = (0 until P).map { s0 =>
        val feats = Array(1.0) ++
          (1 to params.localLags).map(i => smOf(Math.floorMod(s0 - i, P).toLong)) ++
          Seq(smOf(s0), smOf(s0), smOf(s0)) // seas_1, seas_2, sm_t: same slot
        val mu = weights.zip(feats).map { case (w, f) => w * f }.sum
        (s0.toLong, mu)
      }.toDF("slot", "predicted")
      val half =
        if (noisePerStep == 0.0) lit(z * sigma)
        else lit(z * sigma) +
          lit(noisePerStep) * ((col("bucket") - lit(from)) / lit(params.bucketInterval))
            .cast("long") * abs(col("predicted"))
      spark.range(from, to, params.bucketInterval)
        .select(col("id").as("bucket"))
        .withColumn("slot", SeasonalModel.slotCol(col("bucket"),
          SeasonalModelParams(params.bucketInterval, params.period)))
        .join(broadcast(perSlot), "slot")
        .withColumn("lower", col("predicted") - half)
        .withColumn("upper", col("predicted") + half)
        .select("bucket", "predicted", "lower", "upper")
        .orderBy("bucket")
    }
  }
}
