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

  /** Inverse standard normal CDF Φ⁻¹(p) — the `norm.ppf` the reference's
    * forecast uses to turn `percent_interval` into a band z-score
    * (/root/reference/loudml/donut.py:1415). Driver-side scalar (the
    * z-score is a plan literal, never per-row), so no expression tree is
    * needed. Acklam's rational approximation, |relative ε| < 1.15e-9 —
    * far beyond band resolution (bands are rounded to 4 decimals at the
    * API surface). */
  def normPpf(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"ppf needs p in (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    } else if (p <= 1.0 - pLow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    }
  }

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

  /** Per-feature `scores` scaling applied at model-input assembly — the
    * feature DSL's scaling choice (/root/reference/loudml/model.py:97,129;
    * default min_max):
    *
    *  - `"min_max"`     → (x − min)/(max − min), 0 when the series is
    *    constant;
    *  - `"normalize"`   → x/‖x‖₂ (unit L2 norm, identity for an all-zero
    *    series);
    *  - `"standardize"` → (x − μ)/σ_pop with the σ=0→1 guard.
    *
    * Stats are computed per series with a groupBy (map-side partials) and
    * broadcast-joined back — no unpartitioned window, so the shape holds
    * at any series count/length. Adds `outCol`; leaves `valueCol`. */
  def scaleSeries(
      df: org.apache.spark.sql.DataFrame, valueCol: String, method: String,
      outCol: String,
      seriesKeys: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val aggs = Seq(
      min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"),
      avg(col(valueCol)).as("__mu"), stddev_pop(col(valueCol)).as("__sd"),
      sqrt(sum(col(valueCol) * col(valueCol))).as("__l2"))
    val stats =
      if (seriesKeys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(seriesKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val joined =
      if (seriesKeys.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), seriesKeys)
    val x = col(valueCol)
    val scaled = method match {
      case "min_max" =>
        when(col("__mx") === col("__mn"), lit(0.0))
          .otherwise((x - col("__mn")) / (col("__mx") - col("__mn")))
      case "normalize" =>
        x / when(col("__l2") === 0.0 || col("__l2").isNull, lit(1.0))
          .otherwise(col("__l2"))
      case "standardize" => standardize(x, col("__mu"), col("__sd"))
      case m => throw new IllegalArgumentException(s"bad scores: $m")
    }
    joined.withColumn(outCol, scaled)
      .drop("__mn", "__mx", "__mu", "__sd", "__l2")
  }

  /** Per-group winsorization: clip `valueCol` to its group's exact
    * [pLo, pHi] percentile band — the robust outlier-capping
    * preprocessing step (complement of the MAD flagger: cap instead of
    * flag). One group-bounded percentile aggregate broadcast back onto
    * a narrow clip projection — no window, no second scan of the data
    * per group.
    *
    * `edgeDecimals >= 0` quantizes the band edges half-up (+1e-9) —
    * interpolated percentiles are formula-sensitive in the last ulp
    * across engines (the curriculumBins lesson), and a clip compares
    * raw values against the edges. Output column: `<valueCol>_w`. */
  def winsorize(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
      valueCol: String, pLo: Double = 0.05, pHi: Double = 0.95,
      edgeDecimals: Int = -1): org.apache.spark.sql.DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val aggs = Seq(percentile(col(valueCol), lit(pLo)).as("__lo"),
      percentile(col(valueCol), lit(pHi)).as("__hi"))
    val raw =
      if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val q = (c: Column) =>
      if (edgeDecimals < 0) c else round(c + lit(1e-9), edgeDecimals)
    val edges = raw.select((keys.map(col) ++
      Seq(q(col("__lo")).as("__lo"), q(col("__hi")).as("__hi"))): _*)
    val joined =
      if (keys.isEmpty) df.crossJoin(broadcast(edges))
      else df.join(broadcast(edges), keys)
    joined
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Rank-based ROC-AUC (Mann–Whitney U) of a score against a boolean
    * label — the standard evaluation of any scalar quality/relevance
    * scorer (probe, LM score, heuristic) without choosing a threshold.
    * Ties take the conventional half credit.
    *
    * Returns one row: (n_pos, n_neg, auc).
    *
    * Determinism: every intermediate is an INTEGER — per-score
    * (pos, neg) counts, cumulative negatives below, and
    * 2U = Σ pos·(2·negBelow + neg) — so engines agree bit-for-bit
    * regardless of summation order; the only FP op is the final
    * division 2U / (2·P·N). (A float dot-product rank would instead
    * hinge on last-ulp score ordering.)
    *
    * Scale shape: one groupBy(score) with map-side partials (the
    * exchange carries DISTINCT scores), then the cumulative window runs
    * over that distinct-score frame — single-partition, but bounded by
    * score cardinality, not corpus size (a 4-6dp-quantized score in
    * [0,1] caps it at 10⁴-10⁶ rows; quantize upstream for exactly this
    * reason). Final agg is a 1-row reduce. */
  /** Calibration (reliability) table for a [0,1] score: equal-width
    * bins, each with row count, positive count, the empirical positive
    * rate, and the mean score — "is a 0.8 really 80% positive?". The
    * companion diagnostic to [[rocAuc]]: AUC checks RANKING,
    * calibration checks the score's face value.
    *
    * Determinism: bin = floor(score·bins) clamped (pure int),
    * counts are exact, frac_pos is one division of exact integers,
    * and mean_score sums ×10⁶-quantized scores as exact longs (the
    * q_mean_pool pattern) before its single division — engines agree
    * bit-for-bit. One groupBy(bin) with map-side partials; the
    * exchange carries ≤ `bins` rows. */
  def calibrationBins(df: org.apache.spark.sql.DataFrame, scoreCol: String,
      labelCol: String, bins: Int): org.apache.spark.sql.DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    // clamp BOTH ends: a score marginally outside [0,1] (an upstream
    // 1e-16 rounding artifact) lands in the edge bin instead of
    // silently creating a phantom bin -1 or `bins`
    val bin = greatest(lit(0),
      least(floor(col(scoreCol) * lit(bins)), lit(bins - 1))).cast("int")
    val si = round(round(col(scoreCol) + lit(1e-9), 6) * lit(1e6))
      .cast("long")
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(si).as("__ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("frac_pos"),
        (col("__ss").cast("double") / col("n").cast("double") / lit(1e6))
          .as("mean_score"))
  }

  def rocAuc(df: org.apache.spark.sql.DataFrame, scoreCol: String,
      labelCol: String): org.apache.spark.sql.DataFrame =
    rocAucBy(df, Nil, scoreCol, labelCol)

  /** Per-group [[rocAuc]] — one (keys…, n_pos, n_neg, auc) row per
    * group (e.g. per source/language: does the scorer rank well inside
    * EVERY domain, or only on the easy ones?). Same all-integer U
    * arithmetic; the cumulative window partitions by the keys, so its
    * per-partition size is the GROUP's distinct-score count and the
    * global-ordering bottleneck of the ungrouped case disappears
    * entirely.
    *
    * NULL labels count as negatives (the `otherwise` branch), and a
    * NULL score forms its own rank group — filter either out upstream
    * if they should be excluded rather than scored. */
  def rocAucBy(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
      scoreCol: String, labelCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = df
      .groupBy((keys.map(col) :+ col(scoreCol).as("__s")): _*)
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__n"))
    val w =
      if (keys.isEmpty) Window.orderBy("__s")
      else Window.partitionBy(keys.map(col): _*).orderBy("__s")
    val nb = coalesce(sum(col("__n")).over(
      w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val cum = per.withColumn("__nb", nb)
    val aggs = Seq(sum(col("__p")).as("n_pos"),
      sum(col("__n")).as("n_neg"),
      sum(col("__p") * (lit(2L) * col("__nb") + col("__n"))).as("__u2"))
    val g =
      if (keys.isEmpty) cum.agg(aggs.head, aggs.tail: _*)
      else cum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    g.select((keys.map(col) ++ Seq(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        col("__u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))): _*)
  }
}
