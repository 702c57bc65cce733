package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{ConstFill, Feature, TimesQuery}
import graft.sources.JdbcBucket

/** JDBC bucket (embedded Derby): write/read round-trip parity with the
  * in-memory frame, predicate pushdown into the store's SQL (the Spark
  * analog of the reference generating WHERE clauses into InfluxQL), and
  * the bucketed-agg contract running unchanged through the relation. */
class JdbcBucketSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file",
    new java.io.File(sys.props("java.io.tmpdir"), "derby.log").getPath)

  private def freshBucket(table: String): JdbcBucket = {
    val dir = Files.createTempDirectory("graft_jdbc_spec").toFile
    new JdbcBucket("testdb",
      s"jdbc:derby:${dir.getAbsolutePath}/db;create=true", table)
  }

  private def points = Seq(
    (java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:10:00Z")),
      1.5, "a"),
    (java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:40:00Z")),
      2.5, "b"),
    (java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T01:20:00Z")),
      4.0, "a"),
    (java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T03:05:00Z")),
      8.0, "a"))
    .toDF("ts", "value", "tag")

  test("round-trip: overwrite + readPoints preserves rows/values; " +
      "append adds; drop removes the table") {
    val b = freshBucket("pts")
    b.overwrite(points, columnTypes = Some("tag VARCHAR(16)"))
    val back = b.readPoints(spark).orderBy("ts")
    assert(back.count() == 4)
    assert(back.select(sum("value")).as[Double].head() == 16.0)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    b.writePoints(points.limit(1))
    assert(b.readPoints(spark).count() == 5)
    b.drop()
    intercept[Exception] { b.readPoints(spark).count() }
  }

  test("drop rejects table names that are not plain SQL identifiers " +
      "(settings-JSON injection guard); schema-qualified names pass " +
      "validation") {
    val dir = Files.createTempDirectory("graft_jdbc_spec").toFile
    val url = s"jdbc:derby:${dir.getAbsolutePath}/db;create=true"
    for (evil <- Seq("pts; DROP TABLE users", "pts--", "a b", "x'y"))
      intercept[IllegalArgumentException] {
        new JdbcBucket("testdb", url, evil).drop()
      }
    // a qualified identifier passes validation and reaches the store
    // (which then reports the missing table, not a syntax hole)
    intercept[java.sql.SQLException] {
      new JdbcBucket("testdb", url, "app.pts").drop()
    }
  }

  test("time-range + tag predicates push into the store's SQL " +
      "(PushedFilters on the JDBC scan)") {
    val b = freshBucket("pushed")
    b.overwrite(points, columnTypes = Some("tag VARCHAR(16)"))
    val from = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val filtered = b.readPoints(spark)
      .filter(col("ts") >= lit(from) && col("tag") === "a")
      .select("ts", "value")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThanOrEqual(TS") ||
      plan.contains("GreaterThanOrEqual(ts"), plan)
    assert(plan.contains("EqualTo(TAG") || plan.contains("EqualTo(tag"), plan)
    assert(filtered.count() == 3)
  }

  test("TimesQuery through the JDBC relation matches the same query on " +
      "the in-memory frame") {
    val b = freshBucket("tq")
    b.overwrite(points, columnTypes = Some("tag VARCHAR(16)"))
    val from = 1704067200L // 2024-01-01T00:00:00Z
    val feats = Seq(
      Feature("avg_v", "avg", "value", fill = ConstFill(0.0)),
      Feature("cnt_v", "count", "value", fill = ConstFill(0.0)))
    def run(df: org.apache.spark.sql.DataFrame) =
      TimesQuery.run(spark, df, "ts", 3600L, from, from + 4 * 3600L, feats)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .toSeq
    assert(run(b.readPoints(spark)) == run(points))
  }
}
