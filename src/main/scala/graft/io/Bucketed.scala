package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the join-side half of "fast at 100 TB"
  * ([[ZOrder]] is the scan-side half). A fact table that is joined on the
  * same key query after query (orders↔lineitem, doc↔embedding) pays a
  * full shuffle of BOTH sides on every join. Writing each side
  * pre-hash-partitioned into N buckets on the join key moves that shuffle
  * to write time, ONCE: every subsequent join of two tables bucketed on
  * the key with the same N plans as a zero-exchange sort-merge join
  * (and with `sortBy` on the key, zero-sort too — the scan feeds the
  * merge directly).
  *
  * This is Spark's native Hive-style bucketing (`DataFrameWriter.bucketBy`
  * + `saveAsTable`, readable back through the catalog); the reference has
  * no analog — its stores hand the problem to the TSDB — but at the
  * 100 TB design point the repeated-join shuffle IS the bottleneck, and
  * this is the standard fix.
  *
  * Sizing: pick `buckets` so one bucket of the LARGER table fits an
  * executor's task comfortably (e.g. 100 TB / 8192 buckets ≈ 12 GB per
  * bucket pre-compression — halve until the sort spills stop). Both
  * tables MUST use the same bucket count; a mismatch silently
  * reintroduces the shuffle on one side.
  */
object Bucketed {

  /** Write `df` as a catalog table bucketed (and sorted) by `key`.
    * One hash exchange at write time; the payoff is every later join. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(buckets >= 1, "buckets must be >= 1")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Inner-join two same-bucket-count tables on `key`. The plan must show
    * no Exchange on either side (asserted in the spec) — if it does, the
    * bucket counts differ or bucketed reads are disabled. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
