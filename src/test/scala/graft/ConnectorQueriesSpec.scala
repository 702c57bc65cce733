package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Feature
import graft.sources.ConnectorQueries
import graft.sources.ConnectorQueries.{ElasticDsl, InfluxQL, Mongo, OpenTsdb, Prometheus, Warp10}

/** Golden query-builder parity with the reference's network connectors:
  * every expected string below is copied VERBATIM from the reference's
  * own test suites (tests/test_influx.py:184-263,
  * tests/test_opentsdb.py:150-189, tests/test_prometheus.py:60-98) —
  * the half of each connector that is pure query generation, built and
  * pinned offline. */
class ConnectorQueriesSpec extends AnyFunSuite {

  // the reference tests' model: interval 3s, three features
  private val features = Seq(
    Feature("avg_foo", "avg", "foo", measurement = Some("measure1")),
    Feature("count_bar", "count", "bar", measurement = Some("measure2")),
    Feature("avg_baz", "avg", "baz", measurement = Some("measure1"),
      matchAll = Seq("mytag" -> "myvalue")))

  test("influx: time predicates (test_influx.py:184-198)") {
    assert(InfluxQL.timePredicates() == Seq.empty)
    assert(InfluxQL.timePredicates(
      fromDate = Some(1515404366.1234),
      toDate = Some("2018-01-08T14:59:25.456Z")) == Seq(
      "time >= 1515404366123400000",
      "time < 1515423565456000000"))
  }

  test("influx: tag predicates incl. escaping and int/bool dual form (test_influx.py:200-214)") {
    assert(InfluxQL.tagsPredicates(Nil) == Seq.empty)
    assert(InfluxQL.tagsPredicates(Seq(
      "foo" -> "bar",
      "a \"" -> "b '",
      "int" -> 42,
      "bool" -> true)) == Seq(
      "\"foo\"='bar'",
      "\"a \\\"\"='b \\''",
      "(\"int\"='42' OR \"int\"=42)",
      "(\"bool\"='True' OR \"bool\"=True)"))
  }

  test("influx: times queries, default and retention-policy prefix (test_influx.py:216-263)") {
    val where = "time >= 1515404366123400000 and time < 1515423565456000000"
    val queries = InfluxQL.timesQueries(
      bucketInterval = 3, features = features,
      fromDate = Some(1515404366.1234),
      toDate = Some("2018-01-08T14:59:25.456Z"),
      defaultMeasurement = "nosetests")
    assert(queries == Seq(
      s"""select MEAN("foo") as "avg_foo" from "measure1" where $where group by time(3000ms);""",
      s"""select COUNT("bar") as "count_bar" from "measure2" where $where group by time(3000ms);""",
      s"""select MEAN("baz") as "avg_baz" from "measure1" where $where and "mytag"='myvalue' group by time(3000ms);"""))

    val withRp = InfluxQL.timesQueries(
      bucketInterval = 3, features = features,
      fromDate = Some(1515404366.1234),
      toDate = Some("2018-01-08T14:59:25.456Z"),
      defaultMeasurement = "nosetests",
      db = "mydb", retentionPolicy = Some("custom"))
    val prefix = "\"mydb\".\"custom\"."
    assert(withRp == Seq(
      s"""select MEAN("foo") as "avg_foo" from $prefix"measure1" where $where group by time(3000ms);""",
      s"""select COUNT("bar") as "count_bar" from $prefix"measure2" where $where group by time(3000ms);""",
      s"""select MEAN("baz") as "avg_baz" from $prefix"measure1" where $where and "mytag"='myvalue' group by time(3000ms);"""))
  }

  test("influx: full aggregator registry + unsupported metric") {
    def one(metric: String) = InfluxQL.agg(Feature("x", metric, "f"))
    assert(one("mean") == "MEAN(\"f\") as \"x\"")
    assert(one("median") == "MEDIAN(\"f\") as \"x\"")
    assert(one("5percentile") == "PERCENTILE(\"f\", 5)" + " as \"x\"")
    assert(one("95percentile") == "PERCENTILE(\"f\", 95)" + " as \"x\"")
    assert(one("spread") == "SPREAD(\"f\") as \"x\"")
    assert(one("std_dev") == "STDDEV(\"f\") as \"x\"")
    assert(one("derivative") == "DERIVATIVE(\"f\") as \"x\"")
    assert(one("integral") == "INTEGRAL(\"f\") as \"x\"")
    assert(one("mode") == "MODE(\"f\") as \"x\"")
    // the name is double-quote-escaped like the reference (influx.py:195)
    assert(InfluxQL.agg(Feature("a \" b", "sum", "f"))
      == "SUM(\"f\") as \"a \\\" b\"")
    intercept[graft.functions.Metrics.UnsupportedMetric](
      InfluxQL.timesQueries(3, Seq(Feature("x", "mode", "f").copy(metric = "nope")),
        None, None, "m"))
  }

  test("opentsdb: query dicts (test_opentsdb.py:169-189)") {
    val queries = OpenTsdb.timesQueries(
      bucketInterval = 3,
      features = Seq(Feature("avg_foo", "avg", "foo")),
      fromDate = 1515404367.1234,
      toDate = "2018-01-08T14:59:27.456Z")
    assert(queries == Seq(Map(
      "start" -> 1515404367L,
      "end" -> 1515423564L,
      "metric" -> "avg",
      "down_sampler" -> "3s-avg-nan",
      "field" -> "foo",
      "tags" -> Map.empty[String, Any])))
    // tags pass through raw (test_opentsdb.py:150-167)
    val tagged = OpenTsdb.timesQueries(3,
      Seq(Feature("avg_foo", "avg", "foo", matchAll = Seq(
        "foo" -> "bar", "a \"" -> "b '", "int" -> 42, "bool" -> true))),
      1515404367.1234, "2018-01-08T14:59:27.456Z")
    assert(tagged.head("tags") == Map(
      "foo" -> "bar", "a \"" -> "b '", "int" -> 42, "bool" -> true))
    // downsampler follows the metric (opentsdb.py:59-71)
    assert(OpenTsdb.timesQueries(15,
      Seq(Feature("p95_foo", "95percentile", "foo")),
      0.0, 30.0).head("down_sampler") == "15s-p95-nan")
  }

  test("prometheus: query dicts + label matcher (test_prometheus.py:60-98)") {
    assert(Prometheus.tagsPredicates(Seq(
      "foo" -> "bar", "a" -> "b", "int" -> 42, "bool" -> true))
      == "{foo=\"bar\",a=\"b\",int=\"42\",bool=\"True\"}")
    val queries = Prometheus.timesQueries(
      bucketInterval = 3,
      features = Seq(Feature("avg_foo", "avg", "foo")),
      fromDate = 1515404366.1234,
      toDate = "2018-01-08T14:59:25.456Z")
    assert(queries == Seq(Map(
      "start" -> 1515404366L,
      "end" -> 1515423565L,
      "aggregator" -> "avg",
      "step" -> 3L,
      "metric_name" -> "foo",
      "tags" -> "{}")))
  }

  test("elastic: date_histogram body — minimal single-feature golden (elastic.py:471-530)") {
    val (fromMs, toMs) = ElasticDsl.dateRangeToMs(
      Some(1515404366.1234), Some("2018-01-08T14:59:25.456Z"))
    // same double→int truncation as the reference (elastic.py:63-70);
    // verified against CPython: int(1515423565.456*1000) = …456 exactly
    assert(fromMs.contains(1515404366123L) && toMs.contains(1515423565456L))
    val body = ElasticDsl.timesQuery(3,
      Seq(Feature("avg_foo", "avg", "foo")), fromMs, toMs)
    assert(body ==
      """{"size": 0, "aggs": {"histogram": {"date_histogram": {"field": "timestamp", """ +
      """"extended_bounds": {"min": 1515404366123, "max": 1515423562456}, """ +
      """"interval": "3s", "min_doc_count": 0, "time_zone": "UTC", """ +
      """"format": "yyyy-MM-dd'T'HH:mm:ss'Z'", "order": {"_key": "asc"}}, """ +
      """"aggs": {"avg_foo": {"stats": {"field": "foo"}}}}}, """ +
      """"query": {"bool": {"must": [{"range": {"timestamp": """ +
      """{"gte": 1515404366123, "lt": 1515423565456, "format": "epoch_millis"}}}]}}}""")
  }

  test("elastic: sorted aggs, extended_stats for variance family, painless scripts, match_all") {
    val fs = Seq(
      Feature("count_bar", "count", "bar",
        matchAll = Seq("mytag" -> "myvalue", "flag" -> true, "n" -> 7)),
      Feature("avg_foo", "avg", "foo"),
      Feature("var_v", "variance", "value"),
      Feature("scripted", "avg", "value",
        script = Some("doc['v'].value * 2")))
    val body = ElasticDsl.timesQuery(30, fs, None, None)
    // aggs render sorted by feature name (elastic.py:527 `sorted(aggs)`)
    val order = Seq("avg_foo", "count_bar", "scripted", "var_v")
      .map(body.indexOf(_))
    assert(order == order.sorted && order.forall(_ >= 0), body)
    assert(body.contains(""""var_v": {"extended_stats": {"field": "value"}}"""))
    assert(body.contains(
      """"scripted": {"stats": {"script": {"lang": "painless", "inline": "doc['v'].value * 2"}}}"""))
    // match conditions: strings raw, bools lowercase strings, ints numeric
    assert(body.contains("""{"match": {"mytag": "myvalue"}}"""))
    assert(body.contains("""{"match": {"flag": "true"}}"""))
    assert(body.contains("""{"match": {"n": 7}}"""))
    // no date range given: must holds only the match conditions
    assert(!body.contains("epoch_millis"))
    // no query clause at all when nothing filters
    assert(!ElasticDsl.timesQuery(30, Seq(Feature("a", "avg", "f")),
      None, None).contains("query"))
  }

  test("warp10: multi-fetch WarpScript golden (test_warp10.py:75-146)") {
    val fs = Seq(
      Feature("avg_foo", "avg", "foo", matchAll = Seq("a" -> "b")),
      Feature("count_bar", "count", "bar"))
    val script = Warp10.buildMultiFetch("my_read_token", Some("loudml"),
      bucketInterval = 3600, features = fs,
      fromStr = "2018-07-21T00:00:00Z", toStr = "2018-07-22T00:00:00Z")
    assert(script ==
      """[
        |[
        |[
        |'my_read_token'
        |'loudml.foo'
        |{ 'a' 'b' }
        |'2018-07-21T00:00:00Z'
        |'2018-07-22T00:00:00Z'
        |]
        |FETCH
        |bucketizer.mean
        |0
        |3600000000
        |0
        |]
        |BUCKETIZE
        |[
        |[
        |'my_read_token'
        |'loudml.bar'
        |{  }
        |'2018-07-21T00:00:00Z'
        |'2018-07-22T00:00:00Z'
        |]
        |FETCH
        |bucketizer.count
        |0
        |3600000000
        |0
        |]
        |BUCKETIZE
        |]""".stripMargin)
    // non-string tag values refuse like check_tag (warp10.py:28-30)
    intercept[IllegalArgumentException](Warp10.buildMultiFetch(
      "t", None, 3600, Seq(Feature("x", "avg", "f",
        matchAll = Seq("n" -> 7))), "a", "b"))
    // no prefix → bare selector; regexp selector gets ~ (warp10.py:90-94)
    assert(Warp10.buildSelector(None, "foo") == "foo")
    assert(Warp10.buildSelector(Some("p"), ".*", isRegexp = true) == "~p..*")
  }

  test("mongo: $bucket pipeline incl. count's $exists guard and $or match (mongo.py:33-73)") {
    val bounds = Seq(0L, 3L, 6L)
    assert(Mongo.timesPipeline(
      Feature("avg_foo", "avg", "foo"), "timestamp", bounds) ==
      """[{"$bucket": {"groupBy": "$timestamp", "boundaries": [0, 3, 6], """ +
      """"default": null, "output": {"avg_foo": {"$avg": "$foo"}}}}]""")
    // mean normalizes to avg (mongo.py:61-62)
    assert(Mongo.timesPipeline(
      Feature("m", "mean", "foo"), "ts", Seq(0L)).contains("\"$avg\""))
    // count: $exists guard + $sum 1 (mongo.py:51-59)
    assert(Mongo.timesPipeline(
      Feature("count_bar", "count", "bar"), "timestamp", bounds) ==
      """[{"$match": {"bar": {"$exists": true}}}, """ +
      """{"$bucket": {"groupBy": "$timestamp", "boundaries": [0, 3, 6], """ +
      """"default": null, "output": {"count_bar": {"$sum": 1}}}}]""")
    // match_all → leading $or stage (mongo.py:42-49)
    assert(Mongo.timesPipeline(
      Feature("avg_foo", "avg", "foo",
        matchAll = Seq("tag_1" -> "tag_A", "n" -> 7)), "ts", Seq(0L, 3L))
      .startsWith("""[{"$match": {"$or": [{"tag_1": "tag_A"}, {"n": 7}]}}, """))
  }
}
