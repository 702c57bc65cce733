package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

/** Golden cases from the reference's hermetic query-engine tests:
  * /root/reference/tests/test_memdatasource.py:37-74 (micro-series buckets
  * [[2,3],[],[4]], avg [2.5, None, 4.0]) and
  * /root/reference/tests/test_influx.py:265-282 (counts [2,0,1]).
  */
class TimesQuerySpec extends SparkSpec {
  import spark.implicits._

  /** (foo, timestamp) micro-series from test_memdatasource.py:37-49. */
  private def micro: DataFrame =
    Seq((1.0, 0L), (2.0, 1L), (3.0, 2L), (4.0, 8L), (5.0, 10L))
      .toDF("foo", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))

  private def runMicro(features: Seq[Feature], anchor: Boolean): Seq[Row3] =
    TimesQuery.run(spark, micro, "ts", 3L, 1L, 9L, features,
        anchorAtFrom = anchor)
      .collect().toSeq
      .map(r => Row3(r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))

  case class Row3(bucket: Long, v: Option[Double])

  test("membucket golden: avg [2.5, null, 4.0] with from-anchored buckets") {
    val rows = runMicro(Seq(Feature("avg_foo", "avg", "foo")), anchor = true)
    assert(rows.map(_.bucket) == Seq(1L, 4L, 7L))
    assert(rows.map(_.v) == Seq(Some(2.5), None, Some(4.0)))
  }

  test("membucket golden: count [2, 0, 1]") {
    val rows = runMicro(Seq(Feature("count_foo", "count", "foo")), anchor = true)
    assert(rows.map(_.v) == Seq(Some(2.0), Some(0.0), Some(1.0)))
  }

  test("default fill constant (FEATURE avg_foo default=0, test_memdatasource)") {
    val rows = runMicro(
      Seq(Feature("avg_foo", "avg", "foo", fill = ConstFill(0.0))), anchor = true)
    assert(rows.map(_.v) == Seq(Some(2.5), Some(0.0), Some(4.0)))
  }

  test("previous fill forward-fills the gap (loudml/donut.py:597-610)") {
    val rows = runMicro(
      Seq(Feature("avg_foo", "avg", "foo", fill = PreviousFill)), anchor = true)
    assert(rows.map(_.v) == Seq(Some(2.5), Some(2.5), Some(4.0)))
  }

  test("epoch-aligned mode floors the range (influx semantics)") {
    val rows = runMicro(Seq(Feature("avg_foo", "avg", "foo")), anchor = false)
    // aligned range [0,9): buckets 0,3,6; ts=0 now included
    assert(rows.map(_.bucket) == Seq(0L, 3L, 6L))
    assert(rows.map(_.v) == Seq(Some(2.0), None, Some(4.0)))
  }

  test("[from,to[ exclusivity: final point excluded (loudml/bucket.py:166-168)") {
    val rows = runMicro(Seq(Feature("max_foo", "max", "foo")), anchor = true)
    assert(!rows.flatMap(_.v).contains(5.0)) // ts=10 >= to=9
  }

  test("match_all tag filter restricts aggregation (test_influx.py:319-369)") {
    val tagged = Seq(
      (1.0, 1L, "tag1"), (2.0, 2L, "tag1"), (10.0, 2L, "tag2"))
      .toDF("foo", "epoch", "tag_kw")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val out = TimesQuery.run(spark, tagged, "ts", 3L, 0L, 3L,
      Seq(Feature("avg_foo", "avg", "foo", matchAll = Seq("tag_kw" -> "tag1"))))
      .collect()
    assert(out.length == 1 && out(0).getDouble(1) == 1.5)
  }

  test("derivative and integral post-agg transforms") {
    val pts = Seq((0.0, 0L), (2.0, 3L), (6.0, 6L))
      .toDF("foo", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val out = TimesQuery.run(spark, pts, "ts", 3L, 0L, 9L,
      Seq(Feature("d", "derivative", "foo"), Feature("i", "integral", "foo")))
      .collect()
    // buckets 0,3,6 means 0,2,6; derivative (v-lag)/3: null, 2/3, 4/3
    assert(out(0).isNullAt(1))
    assert(math.abs(out(1).getDouble(1) - 2.0 / 3) < 1e-12)
    assert(math.abs(out(2).getDouble(1) - 4.0 / 3) < 1e-12)
    // integral trapezoid (v+lag)/2*3: null, 3, 12
    assert(out(1).getDouble(2) == 3.0 && out(2).getDouble(2) == 12.0)
  }

  test("per-series keys partition the scan and fills") {
    val pts = Seq(
      ("a", 1.0, 1L), ("a", 3.0, 7L), ("b", 10.0, 1L))
      .toDF("host", "foo", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val out = TimesQuery.run(spark, pts, "ts", 3L, 0L, 9L,
      Seq(Feature("avg_foo", "avg", "foo", fill = PreviousFill)),
      seriesKeys = Seq("host"))
    val rows = out.collect().map(r =>
      (r.getString(r.fieldIndex("host")), r.getLong(r.fieldIndex("bucket")),
        r.getDouble(r.fieldIndex("avg_foo"))))
    // 3 buckets per host; host a: 1.0, ffill 1.0, 3.0; host b: 10 throughout
    assert(rows.count(_._1 == "a") == 3 && rows.count(_._1 == "b") == 3)
    assert(rows.filter(_._1 == "a").map(_._3).toSeq == Seq(1.0, 1.0, 3.0))
    assert(rows.filter(_._1 == "b").map(_._3).toSeq == Seq(10.0, 10.0, 10.0))
  }

  test("unsupported metric raises UnsupportedMetric (loudml/errors.py:106-115)") {
    assertThrows[graft.functions.Metrics.UnsupportedMetric](
      Feature("x", "nope", "foo"))
  }
}
