package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Statistical scalar functions used by the scoring pipeline.
  *
  * Spark has no normal-CDF builtin. Rather than a Scala UDF (opaque to
  * codegen) or a custom Catalyst Expression (more code for the same plan),
  * Φ is built as a *Column expression tree* over builtin `exp`/`abs`
  * arithmetic — it stays fully inside whole-stage codegen and is usable
  * from SQL-generated plans. The approximation is Abramowitz & Stegun
  * 7.1.26 (|ε| ≤ 1.5e-7), far below the reference's scoring resolution
  * (scores are 0..100 floats, /root/reference/loudml/donut.py:899-924).
  */
object Stats {

  /** erf(x) via A&S 7.1.26, |error| <= 1.5e-7. */
  def erf(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(x))
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t +
      lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    val y = lit(1.0) - poly * exp(-x * x)
    when(x >= 0, y).otherwise(-y)
  }

  /** Standard normal CDF Φ(x) = 0.5·(1 + erf(x/√2)). */
  def normCdf(x: Column): Column =
    lit(0.5) * (lit(1.0) + erf(x / lit(math.sqrt(2.0))))

  /** Anomaly score for one feature, 0..100, mirroring the reference's
    * `compute_bucket_scores` (/root/reference/loudml/donut.py:899-924):
    *
    *   σ̂ = (upper − μ̂)/3  (upper band is μ̂+3σ̂ by construction)
    *   z  = (y − μ̂)/σ̂
    *   score = 100 · clamp(2·Φ(|z|) − 1, 0, 1)
    *
    * signed by direction and clipped by `anomalyType`:
    * "low"      → only y < μ̂ scores (negative z), else 0
    * "high"     → only y > μ̂ scores
    * "low_high" → both sides score.
    */
  def anomalyScore(
      observed: Column,
      predicted: Column,
      upper: Column,
      anomalyType: String = "low_high"): Column = {
    val sigma = greatest((upper - predicted) / lit(3.0), lit(1e-9))
    val z = (observed - predicted) / sigma
    val raw = lit(100.0) *
      least(greatest(lit(2.0) * normCdf(abs(z)) - lit(1.0), lit(0.0)), lit(1.0))
    anomalyType match {
      case "low"      => when(z < 0, raw).otherwise(lit(0.0))
      case "high"     => when(z > 0, raw).otherwise(lit(0.0))
      case "low_high" => raw
      case t => throw new IllegalArgumentException(s"bad anomaly_type: $t")
    }
  }

  /** Standardize (y−μ)/σ with the reference's σ=0→1 guard
    * (/root/reference/loudml/donut.py:644-650). */
  def standardize(c: Column, mean: Column, std: Column): Column =
    (c - mean) / when(std === 0.0 || std.isNull, lit(1.0)).otherwise(std)
}
