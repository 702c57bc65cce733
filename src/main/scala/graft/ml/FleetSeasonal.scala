package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Stats

/** Per-series seasonal profiles at fleet scale — one model PER KEY,
  * trained in ONE pass.
  *
  * The reference trains one model per configured series; monitoring a
  * million hosts that way means a million training jobs over the same
  * table. Grouping by (series, slot) instead computes every series' own
  * per-slot μ/σ baseline in a single aggregation (map-side partials,
  * one shuffle keyed by series+slot — the same key the predict join
  * needs), and prediction is a join of the bucketed stream against the
  * profile table on (series, slot): each host is scored against ITS OWN
  * diurnal pattern, not a fleet-wide average. The profile table is
  * O(#series · period/bucket_interval) rows — data-scale-independent —
  * and plugs straight into [[FleetScan]] /
  * [[graft.streaming.StreamingEval.startFleet]] as the `score` function.
  *
  * Semantics per series are EXACTLY [[SeasonalModel]]'s (σ=0→1 guard,
  * μ±3σ bands, 0..100 Φ-score with low/high clip) — spec-checked
  * equal to training each key separately.
  */
object FleetSeasonal {

  /** Every series' per-slot profile in one aggregation. */
  def train(bucketed: DataFrame, valueCol: String, seriesKeys: Seq[String],
      p: SeasonalModelParams): DataFrame = {
    require(seriesKeys.nonEmpty, "fleet profile requires seriesKeys")
    bucketed
      .groupBy((seriesKeys.map(col) :+
        SeasonalModel.slotCol(col("bucket"), p)): _*)
      .agg(
        avg(col(valueCol)).as("mu"),
        coalesce(
          when(stddev_pop(col(valueCol)) === 0.0, 1.0)
            .otherwise(stddev_pop(col(valueCol))),
          lit(1.0)).as("sigma"))
  }

  /** Score a keyed bucketed frame against each series' own profile. A
    * series absent from the profile (a host that appeared after
    * training) yields null predictions — `coalesce(score, 0)` downstream
    * treats it as unscored rather than anomalous. */
  def predict(
      bucketed: DataFrame,
      profile: DataFrame,
      valueCol: String,
      seriesKeys: Seq[String],
      p: SeasonalModelParams,
      anomalyType: String = "low_high"): DataFrame =
    bucketed
      .withColumn("slot", SeasonalModel.slotCol(col("bucket"), p))
      .join(profile, seriesKeys :+ "slot", "left")
      .withColumn("predicted", col("mu"))
      .withColumn("lower", col("mu") - lit(3.0) * col("sigma"))
      .withColumn("upper", col("mu") + lit(3.0) * col("sigma"))
      .withColumn("score",
        Stats.anomalyScore(col(valueCol), col("predicted"), col("upper"),
          anomalyType))
      .drop("slot", "mu", "sigma")
}
