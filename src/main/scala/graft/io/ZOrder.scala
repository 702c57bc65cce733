package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) file layout — the storage-side half of "fast at
  * 100 TB". Spark's data skipping reads parquet row-group/file min-max
  * stats; a table range-partitioned on ONE column prunes only on that
  * column. Interleaving the bits of two query dimensions into one sort
  * key keeps rows that are close in BOTH dimensions close on disk, so a
  * 2-D box predicate touches a handful of files instead of all of them —
  * the standard lakehouse layout trick, here as a pure expression +
  * writer so it composes with any sink.
  *
  * The z-value is a deterministic bit-interleave expression (shifts,
  * masks, ors — whole-stage codegen, oracle-checkable); the writer is
  * `repartitionByRange(zv) + sortWithinPartitions(zv)`, i.e. one range
  * exchange at write time, the same cost as any sorted write.
  */
object ZOrder {

  /** Morton interleave of two non-negative integer columns, `bits` bits
    * each (default 21 ⇒ 42-bit z-value, signed-long-safe in every
    * engine). Bit i of x lands at position 2i, bit i of y at 2i+1.
    * Values are masked to `bits` bits — callers bin/rank wider domains
    * first (see [[binned]]). */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton interleave: bit i of column j lands at
    * position i·k + j (k = number of columns). `bits` per column
    * defaults so the z-value stays signed-long-safe (k·bits ≤ 62);
    * [[zValue]] is the k = 2 special case with the same bit layout.
    * Same contract: non-negative integer columns, masked to `bits` —
    * bin/rank wider domains first ([[binned]]). One codegen'd
    * expression (k·bits shift/mask/or terms), no UDF. */
  def zValueN(cols: Seq[Column], bits: Int = 20): Column = {
    val k = cols.size
    require(k >= 2, "need at least 2 columns")
    require(bits >= 1 && k * bits <= 62,
      s"k*bits must fit a signed long: $k*$bits > 62")
    val longs = cols.map(_.cast("long"))
    (0 until bits).flatMap { i =>
      longs.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Equal-width binning of a numeric column onto [0, 2^bits) for
    * z-ordering continuous domains. (lo, hi) are the domain bounds —
    * pass dataset min/max or fixed business bounds. */
  def binned(c: Column, lo: Double, hi: Double, bits: Int = 21): Column = {
    require(hi > lo, "hi must exceed lo")
    val n = (1L << bits) - 1
    least(lit(n), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n + 1))
        .cast("long")))
  }

  /** Write `df` z-ordered on (x, y) into `numFiles` parquet files:
    * range-partition on the z-value (sampled range exchange — balanced
    * files regardless of data skew), sort within each partition, drop
    * the helper column. Each output file then covers a compact z-range,
    * i.e. a compact rectangle union in (x, y) — which is what makes
    * min-max pruning bite on BOTH columns. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      numFiles: Int, bits: Int = 21): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
