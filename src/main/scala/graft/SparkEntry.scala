package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with DuckDB-equivalent `oracleSql` where the operator
  * is SQL-expressible.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *  - every floating-point aggregate is `round(x, 4)` in BOTH engines;
  *  - computed time columns are BIGINT epoch seconds, never timestamps;
  *  - every query has a total ORDER BY on output columns.
  */
object SparkEntry {

  // events table covers [2024-01-01, 2024-01-31) at every SF (TESTDATA.md)
  private val FROM = 1704067200L // 2024-01-01T00:00:00Z
  private val TO   = 1706659200L // 2024-01-31T00:00:00Z
  private val HOUR = 3600L

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The §7.3
    * minimum slice: bucketed avg+count with tag filter and gap fill. */
  def entry(spark: SparkSession): DataFrame =
    timesAvgCount(spark, "/root/testdata/sf0.001")

  private def timesAvgCount(s: SparkSession, dir: String): DataFrame =
    TimesQuery.run(
      s, t(s, dir, "events"), "ts", HOUR, FROM, TO,
      Seq(
        Feature("avg_click", "avg", "value",
          matchAll = Seq("event_type" -> "click"), fill = ConstFill(0.0)),
        Feature("count_click", "count", "value",
          matchAll = Seq("event_type" -> "click"), fill = ConstFill(0.0))))
      .withColumn("avg_click", round(col("avg_click"), 4))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── §2.1/§2.2/§2.3/§2.4: the core times-query (scan+filter+bucket+agg+spine+fill)
    "q_times_avg_count" -> ((s, dir) => timesAvgCount(s, dir)),

    // ── §2.4 basic aggregations (TPC-H Q1 shape)
    "q_agg_basic" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ── §2.4 min/max/spread + stddev/variance/sum_of_squares
    "q_agg_stats" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(min("value"), 4).as("min_v"),
          round(max("value"), 4).as("max_v"),
          round(max("value") - min("value"), 4).as("spread_v"),
          round(stddev_pop("value"), 4).as("stddev_v"),
          round(var_pop("value"), 4).as("var_v"),
          round(sum(col("value") * col("value")), 2).as("sum_sq"))
        .orderBy("event_type")),

    // ── §2.2 predicates: time range + tag equality (match_all)
    "q_filter_tags" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "purchase" &&
          col("user_id") % 2 === 0 &&
          unix_timestamp(col("ts").cast("timestamp")) >= lit(FROM) &&
          unix_timestamp(col("ts").cast("timestamp")) < lit(FROM + 7 * 86400))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")),

    // ── §2.6 top-N
    "q_topn" -> ((s, dir) =>
      t(s, dir, "events")
        .select("event_id", "value")
        .orderBy(col("value").desc, col("event_id").asc)
        .limit(100)),
  )

  /** DuckDB-equivalent SQL per query (same tables, same column names). */
  def oracleSql: Map[String, String] = Map(
    "q_times_avg_count" ->
      s"""WITH spine AS (
         |  SELECT unnest(generate_series($FROM, ${TO - HOUR}, $HOUR)) AS bucket
         |), agg AS (
         |  SELECT CAST(floor(epoch(ts)/$HOUR) AS BIGINT)*$HOUR AS bucket,
         |         avg(CASE WHEN event_type='click' THEN value END) AS avg_click,
         |         CAST(count(CASE WHEN event_type='click' THEN value END) AS DOUBLE) AS count_click
         |  FROM events
         |  WHERE epoch(ts) >= $FROM AND epoch(ts) < $TO
         |  GROUP BY 1
         |)
         |SELECT s.bucket,
         |       round(coalesce(a.avg_click, 0.0), 4) AS avg_click,
         |       coalesce(a.count_click, 0.0) AS count_click
         |FROM spine s LEFT JOIN agg a USING (bucket)
         |ORDER BY s.bucket""".stripMargin,

    "q_agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_agg_stats" ->
      """SELECT event_type,
        |       round(min(value), 4) AS min_v,
        |       round(max(value), 4) AS max_v,
        |       round(max(value) - min(value), 4) AS spread_v,
        |       round(stddev_pop(value), 4) AS stddev_v,
        |       round(var_pop(value), 4) AS var_v,
        |       round(sum(value * value), 2) AS sum_sq
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_filter_tags" ->
      s"""SELECT event_id, user_id, value FROM events
         |WHERE event_type = 'purchase' AND user_id % 2 = 0
         |  AND epoch(ts) >= $FROM AND epoch(ts) < ${FROM + 7 * 86400}
         |ORDER BY event_id""".stripMargin,

    "q_topn" ->
      """SELECT event_id, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin,
  )
}
