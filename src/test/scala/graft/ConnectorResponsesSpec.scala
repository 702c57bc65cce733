package graft

import org.apache.spark.sql.Row

import graft.operators.Feature
import graft.sources.ConnectorResponses

/** Response-decoder parity with the reference connectors'
  * `get_times_data`: each canned payload below is shaped exactly like
  * the server responses the reference clients iterate (see the
  * file:line provenance on each decoder), and the assertions pin the
  * reference's special cases — positional merge, missing→null,
  * OpenTSDB `'NaN'`/count→0, Warp10 right-edge shift + stray-bucket
  * drop, Mongo spine truncation, ES metric keying. */
class ConnectorResponsesSpec extends SparkSpec {

  private val features = Seq(
    Feature("avg_foo", "avg", "foo"),
    Feature("count_bar", "count", "bar"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq

  test("influx: per-statement series merge positionally; missing → null") {
    // statement 0 (avg_foo) has 3 buckets; statement 1 (count_bar)
    // only 2 — bucket 3's count decodes as null (influx.py:571-585)
    val body =
      """{"results": [
        |  {"statement_id": 0, "series": [{"name": "measure1",
        |    "columns": ["time", "avg_foo"],
        |    "values": [["2018-01-08T14:00:00Z", 1.5],
        |               ["2018-01-08T14:00:03Z", null],
        |               ["2018-01-08T14:00:06Z", 2.5]]}]},
        |  {"statement_id": 1, "series": [{"name": "measure2",
        |    "columns": ["time", "count_bar"],
        |    "values": [["2018-01-08T14:00:00Z", 3],
        |               ["2018-01-08T14:00:03Z", 4]]}]}
        |]}""".stripMargin
    val out = rowsOf(ConnectorResponses.influxTimesData(spark, body, features))
    assert(out.length == 3)
    assert(out.map(_.getDouble(1)) == Seq(0.0, 3.0, 6.0)) // offsets (s)
    assert(out.head.getDouble(2) == 1.5)
    assert(out(1).isNullAt(2) && out(1).getDouble(3) == 4.0)
    assert(out(2).getDouble(2) == 2.5 && out(2).isNullAt(3))
    assert(out.head.getString(4) == "2018-01-08T14:00:00Z")
  }

  test("elastic: date_histogram buckets keyed name→metric, ms keys") {
    val body =
      """{"hits": {"total": 10},
        |"aggregations": {"histogram": {"buckets": [
        |  {"key": 1515420000000, "key_as_string": "2018-01-08T14:00:00Z",
        |   "doc_count": 5,
        |   "avg_foo": {"value": 1.5}, "count_bar": {"count": 3}},
        |  {"key": 1515420003000, "key_as_string": "2018-01-08T14:00:03Z",
        |   "doc_count": 0,
        |   "avg_foo": {"value": null}, "count_bar": {"count": 0}}
        |]}}}""".stripMargin
    val out = rowsOf(ConnectorResponses.elasticTimesData(spark, body, features))
    assert(out.length == 2)
    assert(out.head.getDouble(0) == 1515420000.0)
    assert(out.map(_.getDouble(1)) == Seq(0.0, 3.0))
    assert(out.head.getDouble(2) == 1.5 && out.head.getDouble(3) == 3.0)
    assert(out(1).isNullAt(2) && out(1).getDouble(3) == 0.0)
    assert(out(1).getString(4) == "2018-01-08T14:00:03Z")
  }

  test("opentsdb: dps maps; 'NaN' → null except count → 0") {
    val bodies = Seq(
      // avg_foo: NaN at the middle bucket stays null
      """[{"metric": "foo", "tags": {}, "aggregateTags": [],
        |  "dps": {"1515420000": 1.5, "1515420003": "NaN",
        |          "1515420006": 2.5}}]""".stripMargin,
      // count_bar: NaN coerces to 0 (opentsdb.py:452-454)
      """[{"metric": "bar", "tags": {}, "aggregateTags": [],
        |  "dps": {"1515420000": 3, "1515420003": "NaN"}}]""".stripMargin)
    val out =
      rowsOf(ConnectorResponses.opentsdbTimesData(spark, bodies, features))
    assert(out.length == 3)
    assert(out.map(_.getDouble(0)) ==
      Seq(1515420000.0, 1515420003.0, 1515420006.0))
    assert(out(1).isNullAt(2))        // avg NaN → null
    assert(out(1).getDouble(3) == 0.0) // count NaN → 0
    assert(out(2).isNullAt(3))        // count feature had no 3rd point
  }

  test("prometheus: matrix values with string-encoded numbers") {
    val bodies = Seq(
      """{"status": "success", "data": {"resultType": "matrix", "result": [
        |  {"metric": {"__name__": "foo"},
        |   "values": [[1515420000, "1.5"], [1515420003, "2.5"]]}]}}"""
        .stripMargin,
      """{"status": "success", "data": {"resultType": "matrix", "result": [
        |  {"metric": {"__name__": "bar"},
        |   "values": [[1515420000, "3"], [1515420003, "4"]]}]}}"""
        .stripMargin)
    val out =
      rowsOf(ConnectorResponses.prometheusTimesData(spark, bodies, features))
    assert(out.length == 2)
    assert(out.map(_.getDouble(1)) == Seq(0.0, 3.0))
    assert(out.head.getDouble(2) == 1.5 && out.head.getDouble(3) == 3.0)
    assert(out(1).getDouble(2) == 2.5 && out(1).getDouble(3) == 4.0)
  }

  test("warp10: right-edge labels shift left; stray buckets dropped") {
    // bucketized fetch over [1515420000, 1515420009[ at 3s: Warp10
    // labels each bucket with its RIGHT edge in µs (warp10.py:232-240);
    // the 1515420012 label shifts to 1515420009 — outside [from,to[ —
    // and is skipped
    val body =
      """[[
        |  [{"c": "measure1.foo", "l": {}, "v": [
        |    [1515420003000000, 1.5], [1515420006000000, 2.5],
        |    [1515420012000000, 9.9]]}],
        |  [{"c": "measure2.bar", "l": {}, "v": [
        |    [1515420003000000, 3]]}]
        |]]""".stripMargin
    val out = rowsOf(ConnectorResponses.warp10TimesData(spark, body,
      features, bucketIntervalSec = 3L,
      fromTs = 1515420000.0, toTs = 1515420009.0))
    assert(out.length == 3) // full spine, 3 buckets
    assert(out.map(_.getDouble(1)) == Seq(0.0, 3.0, 6.0))
    assert(out.head.getDouble(2) == 1.5 && out.head.getDouble(3) == 3.0)
    assert(out(1).getDouble(2) == 2.5 && out(1).isNullAt(3))
    assert(out(2).isNullAt(2) && out(2).isNullAt(3)) // 9.9 dropped
  }

  test("mongo: _id-indexed spine, truncated at last bucket found") {
    val bodies = Seq(
      """[{"_id": 1515420000, "avg_foo": 1.5},
        |  {"_id": null, "avg_foo": 9.9},
        |  {"_id": 1515420006, "avg_foo": 2.5}]""".stripMargin,
      """[{"_id": 1515420000, "count_bar": 3}]""".stripMargin)
    val out = rowsOf(ConnectorResponses.mongoTimesData(spark, bodies,
      features, bucketIntervalSec = 3L,
      fromDate = 1515420000.0, toDate = 1515420012.0))
    // boundaries reach 1515420012 but the last datum is at index 2 →
    // truncated to 3 rows (mongo.py:243-252); the null _id doc skipped
    assert(out.length == 3)
    assert(out.map(_.getDouble(1)) == Seq(0.0, 3.0, 6.0))
    assert(out.head.getDouble(2) == 1.5 && out.head.getDouble(3) == 3.0)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(out(2).getDouble(2) == 2.5)
  }

  test("empty inputs: influx empty series → empty frame; warp10/mongo raise") {
    val emptyInflux = """{"results": [{"statement_id": 0}, {"statement_id": 1}]}"""
    assert(ConnectorResponses.influxTimesData(spark, emptyInflux, features)
      .count() == 0)
    intercept[IllegalArgumentException] {
      ConnectorResponses.warp10TimesData(spark, "[[]]", features, 3L,
        1515420000.0, 1515420009.0)
    }
    intercept[IllegalArgumentException] {
      ConnectorResponses.mongoTimesData(spark, Seq("[]", "[]"), features, 3L,
        1515420000.0, 1515420009.0)
    }
  }
}
