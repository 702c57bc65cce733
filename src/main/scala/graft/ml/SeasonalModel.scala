package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stats

/** Seasonal-baseline time-series model — the interface-compatible first
  * implementation of the reference's model trait (SURVEY §2.11, plan §7.2
  * step 4): `train` → profile, `predict` → (observed, predicted, lower,
  * upper, score), `forecast` → future bands.
  *
  * Where the reference trains a VAE ("Donut", arXiv 1802.03903,
  * /root/reference/loudml/donut.py:492-1595) to reconstruct each window and
  * derive μ ± 3σ bands by MC sampling
  * (/root/reference/loudml/donut.py:1264-1296), this model learns per
  * seasonal-slot statistics (the `daytime`/`weekday` seasonality inputs the
  * reference exposes, /root/reference/loudml/misc.py:201-212): slot =
  * (bucket mod period)/interval, profile = (μ, σ_pop) per slot. Same output
  * schema, same scoring, same anomaly scan downstream — the VAE is an
  * upgrade path behind the same trait.
  *
  * Scale: train is one groupBy over O(period/interval) slots (tiny shuffle,
  * map-side partials); predict is a broadcast join of the profile (≤ a few
  * thousand rows) onto the bucketed series — no extra shuffle at 100 TB.
  */
final case class SeasonalModelParams(
    bucketInterval: Long,
    period: Long = 86400L, // daily seasonality; 604800 = weekly
    sigmaFloor: Double = 1e-9)

object SeasonalModel {

  def slotCol(bucket: Column, p: SeasonalModelParams): Column =
    (pmod(bucket, lit(p.period)) / lit(p.bucketInterval)).cast("long").as("slot")

  /** Train: per-slot mean/σ_pop profile of `valueCol` over a bucketed
    * series (σ=0→1 guard as in /root/reference/loudml/donut.py:644-650). */
  def train(bucketed: DataFrame, valueCol: String, p: SeasonalModelParams): DataFrame =
    bucketed
      .groupBy(slotCol(col("bucket"), p))
      .agg(
        avg(col(valueCol)).as("mu"),
        coalesce(
          when(stddev_pop(col(valueCol)) === 0.0, 1.0)
            .otherwise(stddev_pop(col(valueCol))),
          lit(1.0)).as("sigma"))

  /** Predict over a bucketed series: adds predicted / lower / upper
    * (μ ± 3σ, matching the reference's 3-sigma bands,
    * /root/reference/loudml/donut.py:1290-1296) and the 0..100 anomaly
    * score (/root/reference/loudml/donut.py:899-924). */
  def predict(
      bucketed: DataFrame,
      profile: DataFrame,
      valueCol: String,
      p: SeasonalModelParams,
      anomalyType: String = "low_high"): DataFrame = {
    val joined = bucketed
      .withColumn("slot", slotCol(col("bucket"), p))
      .join(broadcast(profile), "slot")
    joined
      .withColumn("predicted", col("mu"))
      .withColumn("lower", col("mu") - lit(3.0) * col("sigma"))
      .withColumn("upper", col("mu") + lit(3.0) * col("sigma"))
      .withColumn("score",
        Stats.anomalyScore(col(valueCol), col("predicted"), col("upper"), anomalyType))
      .drop("slot", "mu", "sigma")
  }

  /** Forecast `[from, to[`: future spine joined with the profile — bands
    * only, no observations (the reference's `forecast` analog,
    * /root/reference/loudml/donut.py:1333-1475; the iterative window-roll
    * is VAE-specific, a pure seasonal profile needs no rolling). */
  def forecast(
      spark: SparkSession,
      profile: DataFrame,
      from: Long,
      to: Long,
      p: SeasonalModelParams): DataFrame =
    forecastBands(spark, profile, from, to, p, z = 3.0, noisePerStep = 0.0)

  /** Forecast at a requested confidence (`percent_interval`) with noise
    * growth over the horizon (`percent_noise`) — the reference's forecast
    * parameters (/root/reference/loudml/donut.py:1338-1339,1415,1423).
    * z = Φ⁻¹(1−(1−percentInterval)/2); at step j the reference expands the
    * window by uniform(±percentNoise·bucket_interval/86400·j); the
    * deterministic analog widens the half-band by that envelope times
    * |predicted|. */
  def forecastCI(
      spark: SparkSession, profile: DataFrame, from: Long, to: Long,
      p: SeasonalModelParams, percentInterval: Double,
      percentNoise: Double): DataFrame =
    forecastBands(spark, profile, from, to, p,
      z = Stats.normPpf(1.0 - (1.0 - percentInterval) / 2.0),
      noisePerStep = percentNoise * p.bucketInterval.toDouble / 86400.0)

  private def forecastBands(
      spark: SparkSession, profile: DataFrame, from: Long, to: Long,
      p: SeasonalModelParams, z: Double, noisePerStep: Double): DataFrame = {
    val spine = spark.range(from, to, p.bucketInterval)
      .select(col("id").as("bucket"))
    val half =
      if (noisePerStep == 0.0) lit(z) * col("sigma")
      else lit(z) * col("sigma") +
        lit(noisePerStep) * ((col("bucket") - lit(from)) / lit(p.bucketInterval))
          .cast("long") * abs(col("mu"))
    spine
      .withColumn("slot", slotCol(col("bucket"), p))
      .join(broadcast(profile), "slot")
      .withColumn("predicted", col("mu"))
      .withColumn("lower", col("mu") - half)
      .withColumn("upper", col("mu") + half)
      .select("bucket", "predicted", "lower", "upper")
      .orderBy("bucket")
  }

  /** Mean squared error between observed and predicted
    * (/root/reference/loudml/donut.py:417-424). */
  def mse(predicted: DataFrame, valueCol: String): DataFrame =
    predicted.agg(avg(pow(col(valueCol) - col("predicted"), 2)).as("mse"))

  // ── incremental training (the reference's `continue` / warm-start,
  //    /root/reference/loudml/donut.py:857-897,1068-1080) ──────────────

  /** Sufficient statistics per slot: (slot, n, sum, sumsq). Mergeable, so
    * training continues on new data without revisiting old data — the
    * profile-model warm start. */
  def trainStats(bucketed: DataFrame, valueCol: String, p: SeasonalModelParams): DataFrame =
    bucketed
      .groupBy(slotCol(col("bucket"), p))
      .agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol)).as("sum"),
        sum(col(valueCol) * col(valueCol)).as("sumsq"))

  /** Merge two sufficient-stats frames (full outer on slot, add counts). */
  def mergeStats(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("slot"), col("n").as("n1"), col("sum").as("s1"), col("sumsq").as("q1"))
      .join(b.select(col("slot"), col("n").as("n2"), col("sum").as("s2"),
        col("sumsq").as("q2")), Seq("slot"), "full_outer")
      .select(
        col("slot"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n"),
        (coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0))).as("sum"),
        (coalesce(col("q1"), lit(0.0)) + coalesce(col("q2"), lit(0.0))).as("sumsq"))

  /** Sufficient stats → (slot, mu, sigma) profile; σ_pop = sqrt(E[x²]−μ²),
    * σ=0→1 guard as in train(). */
  def statsToProfile(stats: DataFrame): DataFrame =
    stats.filter(col("n") > 0)
      .withColumn("mu", col("sum") / col("n"))
      .withColumn("var", greatest(col("sumsq") / col("n") - col("mu") * col("mu"),
        lit(0.0)))
      .withColumn("sigma", when(sqrt(col("var")) === 0.0, 1.0).otherwise(sqrt(col("var"))))
      .select("slot", "mu", "sigma")

  // ── model selection (the reference's hyperparameter search,
  //    /root/reference/loudml/donut.py:800-855, TrainValidationSplit-style) ──

  /** Fit one profile per candidate period, score each on the validation
    * series by MSE, return (bestParams, profile). The candidate set is the
    * profile-model's hyperparameter grid (the VAE greed over
    * latent/intermediate dims maps to period/interval choices here). */
  def fitBest(
      train: DataFrame, valid: DataFrame, valueCol: String,
      bucketInterval: Long, periods: Seq[Long]): (SeasonalModelParams, DataFrame) = {
    val scored = periods.map { period =>
      val p = SeasonalModelParams(bucketInterval, period)
      val profile = SeasonalModel.train(train, valueCol, p)
      val err = mse(predict(valid, profile, valueCol, p), valueCol)
        .collect()(0).getDouble(0)
      (p, profile, err)
    }
    val best = scored.minBy(_._3)
    (best._1, best._2)
  }
}

/** The seasonal baseline behind the [[ModelType]] registry seam
  * (/root/reference/loudml/model.py:445-468). */
object SeasonalModelType extends ModelType {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  val name = "seasonal"

  private def jNum(j: JValue): Option[Double] = j match {
    case JInt(x)     => Some(x.toDouble)
    case JLong(x)    => Some(x.toDouble)
    case JDouble(x)  => Some(x)
    case JDecimal(x) => Some(x.toDouble)
    case _           => None
  }

  def parseParams(json: String): SeasonalModelParams = {
    val j = JsonMethods.parse(json)
    SeasonalModelParams(
      bucketInterval = jNum(j \ "bucket_interval")
        .getOrElse(throw new IllegalArgumentException(
          "seasonal settings need bucket_interval")).toLong,
      period = jNum(j \ "period").getOrElse(86400.0).toLong)
  }

  def train(bucketed: DataFrame, valueCol: String, settingsJson: String): TrainedModel =
    new TrainedSeasonal(
      SeasonalModel.train(bucketed, valueCol, parseParams(settingsJson)),
      parseParams(settingsJson))

  def load(spark: SparkSession, profile: DataFrame, settingsJson: String): TrainedModel =
    new TrainedSeasonal(profile, parseParams(settingsJson))

  final class TrainedSeasonal(
      val profile: DataFrame, p: SeasonalModelParams) extends TrainedModel {
    def modelType: String = name
    def settingsJson: String =
      s"""{"type":"$name","bucket_interval":${p.bucketInterval},""" +
        s""""period":${p.period}}"""
    def predict(bucketed: DataFrame, valueCol: String,
        anomalyType: String = "low_high"): DataFrame =
      SeasonalModel.predict(bucketed, profile, valueCol, p, anomalyType)
    def forecast(spark: SparkSession, from: Long, to: Long): DataFrame =
      SeasonalModel.forecast(spark, profile, from, to, p)
    def forecastCI(spark: SparkSession, from: Long, to: Long,
        percentInterval: Double, percentNoise: Double): DataFrame =
      SeasonalModel.forecastCI(spark, profile, from, to, p,
        percentInterval, percentNoise)
  }
}
