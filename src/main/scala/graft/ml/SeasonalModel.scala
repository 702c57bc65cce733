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
      p: SeasonalModelParams): DataFrame = {
    val spine = spark.range(from, to, p.bucketInterval)
      .select(col("id").as("bucket"))
    spine
      .withColumn("slot", slotCol(col("bucket"), p))
      .join(broadcast(profile), "slot")
      .withColumn("predicted", col("mu"))
      .withColumn("lower", col("mu") - lit(3.0) * col("sigma"))
      .withColumn("upper", col("mu") + lit(3.0) * col("sigma"))
      .select("bucket", "predicted", "lower", "upper")
      .orderBy("bucket")
  }

  /** Mean squared error between observed and predicted
    * (/root/reference/loudml/donut.py:417-424). */
  def mse(predicted: DataFrame, valueCol: String): DataFrame =
    predicted.agg(avg(pow(col(valueCol) - col("predicted"), 2)).as("mse"))
}
