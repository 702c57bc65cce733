package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Metric name → aggregation Column registry.
  *
  * Covers every aggregation metric any reference connector supports
  * (canonical names + aliases normalized as in
  * /root/reference/loudml/influx.py:39-59 and
  * /root/reference/docs/reference/feature-dsl/times-dsl.asciidoc:32-41).
  *
  * All metrics are expressed with built-in codegen'd aggregate functions so
  * the whole bucketed aggregation stays inside whole-stage codegen with
  * partial (map-side) aggregation — no UDAFs. `derivative` / `integral` are
  * post-aggregation window transforms (as in InfluxDB,
  * /root/reference/loudml/influx.py:114-121) handled by
  * [[graft.operators.TimesQuery]] after the groupBy.
  *
  * stddev/variance use *population* semantics: the reference's ES
  * `extended_stats` and Prometheus `stddev` are population-based
  * (/root/reference/loudml/elastic.py:447-450,
  * /root/reference/loudml/prometheus.py:59-60).
  */
object Metrics {

  final case class UnsupportedMetric(metric: String)
      extends IllegalArgumentException(s"unsupported metric: $metric")
  // mirrors /root/reference/loudml/errors.py:106-115

  /** Canonicalize aliases: mean/average→avg, std_dev→stddev, med→median … */
  def canonical(metric: String): String = metric.toLowerCase match {
    case "mean" | "average" | "avg"              => "avg"
    case "std_dev" | "std_deviation" | "stddev"  => "stddev"
    case "med" | "median"                        => "median"
    case "deriv" | "derivative"                  => "derivative"
    case m                                       => m
  }

  /** True for metrics computed from the bucketed series *after* the groupBy
    * (they need lag/ordering across buckets, like InfluxQL derivative()). */
  def isPostAgg(metric: String): Boolean = canonical(metric) match {
    case "derivative" | "integral" => true
    case _                         => false
  }

  /** True for metrics whose bucket value is `array<double>` rather than a
    * scalar (general topk/bottomk) — callers must not cast them down. */
  def isArrayValued(metric: String): Boolean = canonical(metric) match {
    case topkRe(_) | bottomkRe(_) => true
    case _                        => false
  }

  private val percentileRe = "^(\\d{1,2})percentile$".r
  private val topkRe = "^topk_([1-9]\\d{0,3})$".r
  private val bottomkRe = "^bottomk_([1-9]\\d{0,3})$".r

  /** Magnitude bounds for the exact-avg decimal lane: values outside
    * `[DecimalSafeMin, DecimalSafeMax]` (absolute, nonzero) route their
    * group to double avg. */
  private val DecimalSafeMax = 1e13
  private val DecimalSafeMin = 1e-9

  /** Aggregation column for `metric` over value column `c`.
    *
    * @param exact when true, median/percentiles use the exact `percentile`
    *   aggregate (needed for oracle-equality tests); when false they use
    *   `percentile_approx` (t-digest, single-pass, the right choice at
    *   100 TB — bounded memory per group, mergeable partials).
    */
  def agg(metric: String, c: Column, exact: Boolean = true): Column =
    canonical(metric) match {
      case "avg"            =>
        // exact tier: decimal-sum / count — double summation is order-
        // dependent (partition order differs from any sequential oracle,
        // visible at the 4th decimal once buckets hold hundreds of rows);
        // decimal accumulation is exact, so any engine and any partition
        // count agree bit-for-bit. approx tier keeps codegen'd double avg.
        //
        // The decimal lane only admits |v| ≤ 1e13 (so the (38,12) sum
        // accumulator absorbs 10^13 rows per bucket before overflow —
        // under Spark 4's default ANSI mode an unguarded cast/sum would
        // ERROR the whole query at 1e18) and, per group, the smallest
        // nonzero |v| must be ≥ 1e-9 (12 fractional digits truncate
        // below 1e-12; at ≥1e-9 that is ≤0.1% relative error). Out-of-
        // range groups fall back to plain double avg — graceful
        // degradation instead of a null/error cliff. Unsafe summands are
        // nulled BEFORE the cast so ANSI can never throw on the branch
        // not taken.
        if (exact) {
          val absC = abs(c)
          val decSum = sum(when(absC <= DecimalSafeMax, c)
            .cast(org.apache.spark.sql.types.DecimalType(30, 12)))
          val minNonzero = coalesce(min(when(absC > 0, absC)), lit(1.0))
          when(max(absC) <= DecimalSafeMax && minNonzero >= DecimalSafeMin,
            decSum.cast("double") / count(c))
            .otherwise(avg(c))
        } else avg(c)
      case "count"          => count(c).cast("double") // count non-null = field-exists semantics (loudml/mongo.py:51-53)
      case "min"            => min(c)
      case "max"            => max(c)
      case "sum"            => sum(c)
      case "stddev"         => stddev_pop(c)
      case "variance"       => var_pop(c)
      case "sum_of_squares" => sum(c * c)
      case "spread"         => max(c) - min(c) // influx spread (loudml/influx.py:164-166)
      case "median"         => pct(c, 0.5, exact)
      case "mode"           => deterministicMode(c)
      case percentileRe(p)  => pct(c, p.toInt / 100.0, exact)
      // prometheus topk/bottomk: bare names keep the reference's k=1
      // scalar semantics (loudml/prometheus.py:65-66); `topk_N` /
      // `bottomk_N` return the general k-element array via the
      // bounded-heap native aggregate (O(k) state, mergeable partials —
      // see [[graft.functions.TopKAgg]])
      case "topk"           => max(c)
      case "bottomk"        => min(c)
      case topkRe(k)        => TopKExprs.topK(c, k.toInt)
      case bottomkRe(k)     => TopKExprs.bottomK(c, k.toInt)
      case m                => throw UnsupportedMetric(m)
    }

  private def pct(c: Column, q: Double, exact: Boolean): Column =
    if (exact) percentile(c, lit(q)) else percentile_approx(c, lit(q), lit(10000))

  /** Mode with a deterministic tie-break: Spark 4's
    * `mode(c, deterministic = true)` returns the LOWEST value among
    * equally-frequent candidates, which is exactly InfluxDB's mode
    * tie-break rule (lowest value wins). Oracle-checked through
    * TimesQuery by q_times_mode against an explicit
    * rank-by-(count desc, value asc) DuckDB mirror. */
  def deterministicMode(c: Column): Column = mode(c, deterministic = true)

  /** Validate a metric name (unknown → UnsupportedMetric). */
  def validate(metric: String): String = {
    val m = canonical(metric)
    if (isPostAgg(m)) m
    else { agg(m, lit(0.0)); m } // throws on unknown
  }
}
