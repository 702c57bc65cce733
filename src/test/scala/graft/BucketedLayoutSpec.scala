package graft

import org.apache.spark.sql.functions._

import graft.io.Bucketed

/** Bucketed-layout spec: the write-once-shuffle-never join contract.
  * Uses the session catalog (in-memory derby metastore + local
  * spark-warehouse dir); tables are dropped after each test. */
class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  /** Small test tables would broadcast-join (hiding the bucketing
    * entirely) — force the shuffle-family planner the big-table case
    * uses, then restore. */
  private def noBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("colocated join of two same-N bucketed tables: zero exchanges, " +
      "zero sorts, same rows as the plain join") {
    drop("bk_orders", "bk_items")
    val orders = spark.range(0, 1000).select(col("id").as("o_id"),
      (col("id") % 7).as("status"))
    val items = spark.range(0, 3000).select((col("id") % 1000).as("o_id"),
      (col("id") * 2).as("qty"))
    Bucketed.writeBucketed(orders, "bk_orders", "o_id", 4)
    Bucketed.writeBucketed(items, "bk_items", "o_id", 4)
    try noBroadcast {
      val j = Bucketed.colocatedJoin(spark, "bk_orders", "bk_items", "o_id")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(j.count() === orders.join(items, "o_id").count())
    } finally drop("bk_orders", "bk_items")
  }

  test("bucket-count mismatch reintroduces an exchange (documented trap)") {
    drop("bk_a", "bk_b")
    val a = spark.range(0, 100).select(col("id").as("k"), col("id").as("va"))
    val b = spark.range(0, 100).select(col("id").as("k"), col("id").as("vb"))
    Bucketed.writeBucketed(a, "bk_a", "k", 4)
    Bucketed.writeBucketed(b, "bk_b", "k", 8)
    try noBroadcast {
      val p = Bucketed.colocatedJoin(spark, "bk_a", "bk_b", "k")
        .queryExecution.executedPlan.toString
      assert(p.contains("Exchange hashpartitioning"), p)
    } finally drop("bk_a", "bk_b")
  }
}
