package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-origin backtesting for the fleet forecaster — the evaluation
  * loop the reference leaves to the operator (train once, eyeball
  * `_forecast`): at each origin o the model trains on strictly-prior
  * data, forecasts the next `horizon`, and is scored against what
  * actually happened. This is the standard time-series cross-validation
  * scheme (forward chaining) — the only split that never leaks the
  * future into training.
  *
  * Scale shape: each origin's train is ONE distributed keyed job
  * ([[FleetHoltWinters.train]] — per-key sequential fit inside
  * mapGroups) and its forecast a narrow projection; the origins loop on
  * the driver because backtests use a HANDFUL of origins by design
  * (3-10) — the per-origin frames union into one plan and the actuals
  * join + metric aggregation run as a single keyed job over all origins
  * at once.
  */
object Backtest {

  /** Per-(key, origin) forecast quality over `[origin, origin+horizon)`:
    * `n_buckets`, `mae`, `mape` (zero-actual buckets excluded), and
    * `coverage` (fraction of actuals inside the ±z·σ band — calibration,
    * not just accuracy). Buckets with no actual observation are simply
    * absent from the join (scored on what happened, not on gaps). */
  def rollingOrigin(series: DataFrame, valueCol: String,
      keys: Seq[String], p: HoltWintersParams, origins: Seq[Long],
      horizon: Long): DataFrame = {
    require(origins.nonEmpty, "need at least one origin")
    require(horizon >= p.bucketInterval, "horizon must cover >= 1 bucket")
    val forecasts = origins.map { o =>
      val states = FleetHoltWinters.train(
        series.filter(col("bucket") < o), valueCol, keys, p)
      FleetHoltWinters.forecast(states, keys, o, o + horizon, p)
        .withColumn("origin", lit(o))
    }.reduce(_ unionByName _)
    val actuals = series.select(
      (keys.map(col) :+ col("bucket") :+
        col(valueCol).cast("double").as("__actual")): _*)
    val err = abs(col("__actual") - col("predicted"))
    forecasts.join(actuals, keys :+ "bucket")
      .groupBy((keys.map(col) :+ col("origin")): _*)
      .agg(
        count(lit(1)).as("n_buckets"),
        avg(err).as("mae"),
        avg(when(abs(col("__actual")) > 1e-12,
          err / abs(col("__actual")))).as("mape"),
        avg(when(col("__actual") >= col("lower") &&
          col("__actual") <= col("upper"), 1.0).otherwise(0.0))
          .as("coverage"))
  }

  /** Rolling-origin backtest for ANY registered [[ModelType]] (solo
    * series): at each origin the model trains on strictly-prior
    * buckets through the registry seam and forecasts the next
    * `horizon`; metrics as in [[rollingOrigin]]. This is the
    * model-agnostic payoff of the trait — seasonal, Holt-Winters, the
    * tied-weights AE, and the Donut VAE all backtest through one
    * harness, so model selection can be an evidence-driven query
    * instead of a default. */
  def rollingOriginModel(series: DataFrame, valueCol: String,
      typeName: String, settingsJson: String, origins: Seq[Long],
      horizon: Long): DataFrame = {
    require(origins.nonEmpty, "need at least one origin")
    val spark = series.sparkSession
    val tpe = ModelRegistry(typeName)
    val forecasts = origins.map { o =>
      val trained = tpe.train(
        series.filter(col("bucket") < o), valueCol, settingsJson)
      trained.forecast(spark, o, o + horizon)
        .withColumn("origin", lit(o))
    }.reduce(_ unionByName _)
    val actuals = series.select(col("bucket"),
      col(valueCol).cast("double").as("__actual"))
    val err = abs(col("__actual") - col("predicted"))
    forecasts.join(actuals, Seq("bucket"))
      .groupBy(col("origin"))
      .agg(
        count(lit(1)).as("n_buckets"),
        avg(err).as("mae"),
        avg(when(abs(col("__actual")) > 1e-12,
          err / abs(col("__actual")))).as("mape"),
        avg(when(col("__actual") >= col("lower") &&
          col("__actual") <= col("upper"), 1.0).otherwise(0.0))
          .as("coverage"))
  }
}
