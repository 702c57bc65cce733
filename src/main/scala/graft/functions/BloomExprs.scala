package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's internal Bloom-filter expressions (the
  * same kernels Catalyst's runtime row-level filtering injects around
  * shuffle joins). Exposed here so graft operators can build an explicit
  * membership prefilter where the optimizer can't infer one — e.g. a
  * corpus-fingerprint set consulted by incremental dedup
  * ([[graft.operators.Dedup.bloomAntiJoin]]).
  *
  * Both sides hash with `xxhash64` (the type `BloomFilterAggregate`
  * requires); the filter is probabilistic so it NEVER decides membership
  * alone — callers combine "might contain" positives with an exact join,
  * keeping results exact (and oracle-checkable) while only the candidate
  * fraction pays the shuffle.
  */
object BloomExprs {

  /** Bits for a target false-positive probability at `items` insertions
    * (standard Bloom sizing: m = -n·ln(p)/ln²2), floored at 64. */
  def numBits(items: Long, fpp: Double): Long = {
    require(items > 0, "items must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0,1)")
    math.max(64L, math.ceil(-items * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong)
  }

  /** Aggregate building a Bloom filter (binary) over `xxhash64(key)`.
    * Distributed build with mergeable partials, like any sketch agg. */
  def bloomAgg(key: Column, items: Long, fpp: Double): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      ColumnBridge.expression(lit(items)),
      ColumnBridge.expression(lit(numBits(items, fpp)))
    ).toAggregateExpression())

  /** `might_contain` probe of a driver-materialized filter. The bytes ride
    * the plan as a literal (broadcast with the task binaries) — the same
    * "small trained artifact as plan literal" pattern as IVF centroids. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(bloomBytes)),
      ColumnBridge.expression(xxhash64(key))))
}
