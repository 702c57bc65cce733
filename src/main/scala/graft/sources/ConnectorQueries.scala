package graft.sources

import graft.api.DateMath
import graft.functions.Metrics
import graft.operators.Feature

/** Offline query-builder parity for the reference's network TSDB
  * connectors. The connectors themselves (InfluxDB
  * /root/reference/loudml/influx.py:307-694, Elasticsearch
  * /root/reference/loudml/elastic.py:133-608, OpenTSDB
  * /root/reference/loudml/opentsdb.py, Prometheus
  * /root/reference/loudml/prometheus.py, Warp10
  * /root/reference/loudml/warp10.py, MongoDB
  * /root/reference/loudml/mongo.py) are network clients and cannot
  * be built or exercised in this zero-egress environment — but their
  * QUERY-BUILDER half is pure string/dict generation, golden-tested in
  * the reference (tests/test_influx.py:184-263, tests/test_opentsdb.py:
  * 169-189, tests/test_prometheus.py:78-98, tests/test_warp10.py:
  * 75-146) — so that half is built and pinned here, byte-for-byte
  * against the reference's own expected strings. A future
  * network-enabled [[Bucket]] impl composes one of these builders with
  * an HTTP client; everything testable offline is tested offline.
  *
  * Scale note: these builders run on the DRIVER once per query (string
  * assembly over a handful of features) — nothing here touches data.
  */
object ConnectorQueries {

  /** `make_ts` (/root/reference/loudml/misc.py:181-190): float epoch
    * seconds pass through, strings parse as epoch / ISO / now±delta. */
  def makeTs(mixed: Any,
      nowEpoch: Long = System.currentTimeMillis() / 1000): Double =
    mixed match {
      case d: Double => d
      case f: Float  => f.toDouble
      case l: Long   => l.toDouble
      case i: Int    => i.toDouble
      case s: String => DateMath.parseTs(s, nowEpoch)
      case other => throw new IllegalArgumentException(
        s"cannot parse timestamp from $other")
    }

  /** Python-`str()` rendering for tag values — the reference formats
    * booleans as `True`/`False` (capitalized) and numbers plainly. */
  private def pyStr(v: Any): String = v match {
    case b: Boolean => if (b) "True" else "False"
    case other      => other.toString
  }

  /** InfluxQL generation (/root/reference/loudml/influx.py:88-195,
    * 224-295, 521-546), incl. quote escaping and the
    * `"db"."retention_policy".` from-prefix. */
  object InfluxQL {

    /** misc.py:48-59 — the two one-character translate tables. */
    def escapeQuotes(s: String): String = s.replace("'", "\\'")
    def escapeDoubleQuotes(s: String): String = s.replace("\"", "\\\"")

    /** `ts_to_ns` (influx.py:60-68): truncate to µs first — multiplying
      * by 1e9 directly loses mantissa, the reference comments the same
      * trap. */
    def tsToNs(ts: Double): Long = (ts * 1e6).toLong * 1000L

    /** `_build_time_predicates` (influx.py:224-249). */
    def timePredicates(
        fromDate: Option[Any] = None, toDate: Option[Any] = None,
        fromIncluded: Boolean = true, toIncluded: Boolean = false)
        : Seq[String] =
      fromDate.map(f =>
        s"time ${if (fromIncluded) ">=" else ">"} ${tsToNs(makeTs(f))}")
        .toSeq ++
      toDate.map(t =>
        s"time ${if (toIncluded) "<=" else "<"} ${tsToNs(makeTs(t))}").toSeq

    /** `_build_tags_predicates` (influx.py:251-277): string values get
      * the quoted form only; bool/int values get the
      * `("k"='v' OR "k"=v)` dual form (tag vs field ambiguity). */
    def tagsPredicates(matchAll: Seq[(String, Any)]): Seq[String] =
      matchAll.map { case (tag, value) =>
        val quotedTag = "\"" + escapeDoubleQuotes(tag) + "\""
        val base = s"$quotedTag='${escapeQuotes(pyStr(value))}'"
        value match {
          case _: Boolean | _: Int | _: Long =>
            s"($base OR $quotedTag=${pyStr(value)})"
          case _ => base
        }
      }

    /** `_build_agg` + the aggregator registry (influx.py:88-195) —
      * exact alias set, exact InfluxQL function names. */
    def agg(feature: Feature): String = {
      val f = "\"" + feature.field + "\""
      val fn = feature.metric.toLowerCase match {
        case "avg" | "mean" | "average" => s"MEAN($f)"
        case "count"                    => s"COUNT($f)"
        case "deriv" | "derivative"     => s"DERIVATIVE($f)"
        case "integral"                 => s"INTEGRAL($f)"
        case "max"                      => s"MAX($f)"
        case "med" | "median"           => s"MEDIAN($f)"
        case "min"                      => s"MIN($f)"
        case "mode"                     => s"MODE($f)"
        case "5percentile"              => s"PERCENTILE($f, 5)"
        case "10percentile"             => s"PERCENTILE($f, 10)"
        case "90percentile"             => s"PERCENTILE($f, 90)"
        case "95percentile"             => s"PERCENTILE($f, 95)"
        case "spread"                   => s"SPREAD($f)"
        case "stddev" | "std_dev"       => s"STDDEV($f)"
        case "sum"                      => s"SUM($f)"
        case _ => throw Metrics.UnsupportedMetric(feature.metric)
      }
      s"""$fn as "${escapeDoubleQuotes(feature.name)}""""
    }

    /** `"db"."rp".` prefix when a retention policy is configured
      * (influx.py:330-337), else empty. */
    def fromPrefix(db: String, retentionPolicy: Option[String]): String =
      retentionPolicy.fold("")(rp =>
        "\"" + escapeDoubleQuotes(db) + "\".\"" +
          escapeDoubleQuotes(rp) + "\".")

    /** `_build_times_queries` (influx.py:521-546): one InfluxQL
      * statement per feature — `select AGG as "name" from
      * [prefix]"measurement" where time-range [and tags] group by
      * time(Xms);`. */
    def timesQueries(
        bucketInterval: Double,
        features: Seq[Feature],
        fromDate: Option[Any],
        toDate: Option[Any],
        defaultMeasurement: String,
        db: String = "",
        retentionPolicy: Option[String] = None): Seq[String] = {
      val timePred = timePredicates(fromDate, toDate)
      val prefix = fromPrefix(db, retentionPolicy)
      features.map { feature =>
        val must = timePred ++ tagsPredicates(feature.matchAll)
        val where =
          if (must.nonEmpty) " where " + must.mkString(" and ") else ""
        val measurement =
          escapeDoubleQuotes(feature.measurement.getOrElse(defaultMeasurement))
        val ms = (bucketInterval * 1000).toInt
        s"""select ${agg(feature)} from $prefix"$measurement"$where group by time(${ms}ms);"""
      }
    }
  }

  /** OpenTSDB query-dict generation
    * (/root/reference/loudml/opentsdb.py:36-84, 59-71, 393-423). */
  object OpenTsdb {

    val Downsample: Map[String, String] = Map(
      "avg" -> "avg", "mean" -> "avg", "average" -> "avg",
      "stddev" -> "dev", "std_dev" -> "dev", "count" -> "count",
      "min" -> "min", "max" -> "max", "sum" -> "sum",
      "90percentile" -> "p90", "95percentile" -> "p95")

    /** `floor` (opentsdb.py:36-37). */
    def floorTs(ts: Double, interval: Long): Long =
      (ts / interval).toLong * interval

    /** `_build_times_queries` (opentsdb.py:393-423): one query dict per
      * feature — `[start, end]` floored to the interval with the end
      * pulled back one bucket, the `Xs-agg-nan` down-sampler, raw tag
      * map. */
    def timesQueries(
        bucketInterval: Long,
        features: Seq[Feature],
        fromDate: Any,
        toDate: Any): Seq[Map[String, Any]] = {
      val start = floorTs(makeTs(fromDate), bucketInterval)
      val end = floorTs(makeTs(toDate), bucketInterval) - bucketInterval
      features.map { feature =>
        Map(
          "start" -> start,
          "end" -> end,
          "metric" -> feature.metric,
          "down_sampler" ->
            s"${bucketInterval}s-${Downsample.getOrElse(feature.metric, "avg")}-nan",
          "field" -> feature.field,
          "tags" -> feature.matchAll.toMap)
      }
    }
  }

  /** Prometheus query-dict generation
    * (/root/reference/loudml/prometheus.py:80-90, 314-334). */
  object Prometheus {

    /** `_build_tags_predicates` (prometheus.py:80-90): the PromQL label
      * matcher string. */
    def tagsPredicates(matchAll: Seq[(String, Any)]): String =
      matchAll.map { case (t, v) => s"""$t="${pyStr(v)}"""" }
        .mkString("{", ",", "}")

    /** `_build_times_queries` (prometheus.py:314-334). */
    def timesQueries(
        bucketInterval: Long,
        features: Seq[Feature],
        fromDate: Any,
        toDate: Any): Seq[Map[String, Any]] =
      features.map { feature =>
        Map(
          "start" -> makeTs(fromDate).toLong,
          "end" -> makeTs(toDate).toLong,
          "aggregator" -> feature.metric,
          "step" -> bucketInterval,
          "metric_name" -> feature.field,
          "tags" -> tagsPredicates(feature.matchAll))
      }
  }

  /** Elasticsearch search-body generation
    * (/root/reference/loudml/elastic.py:63-131, 436-530) rendered as a
    * canonical JSON string (field order = the reference's dict-literal
    * construction order; per-feature aggs sorted by name exactly as
    * `for x in sorted(aggs)` does). */
  object ElasticDsl {

    /** Minimal ordered JSON AST — ordering is the point (a Map would
      * shuffle fields and break golden comparison). */
    sealed trait J { def render: String }
    final case class JObj(fields: Seq[(String, J)]) extends J {
      def render: String =
        fields.map { case (k, v) => s""""$k": ${v.render}""" }
          .mkString("{", ", ", "}")
    }
    final case class JArr(items: Seq[J]) extends J {
      def render: String = items.map(_.render).mkString("[", ", ", "]")
    }
    final case class JStr(s: String) extends J {
      def render: String =
        "\"" + s.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case c    => c.toString
        } + "\""
    }
    final case class JNum(n: Long) extends J { def render: String = n.toString }
    final case class JBool(b: Boolean) extends J {
      def render: String = if (b) "true" else "false"
    }
    case object JNull extends J { def render: String = "null" }

    /** `_date_range_to_ms` (elastic.py:63-70). */
    def dateRangeToMs(fromDate: Option[Any], toDate: Option[Any])
        : (Option[Long], Option[Long]) =
      (fromDate.map(f => (makeTs(f) * 1000).toLong),
        toDate.map(t => (makeTs(t) * 1000).toLong))

    /** `_build_match_all` (elastic.py:73-95): bools lowercase, strings
      * quote-escaped, numbers raw. */
    private[sources] def matchAllConditions(
        matchAll: Seq[(String, Any)]): Seq[J] =
      matchAll.map { case (key, value) =>
        val v: J = value match {
          case b: Boolean => JStr(if (b) "true" else "false")
          case s: String  => JStr(InfluxQL.escapeQuotes(s))
          case i: Int     => JNum(i.toLong)
          case l: Long    => JNum(l)
          case other      => JStr(other.toString)
        }
        JObj(Seq("match" -> JObj(Seq(key -> v))))
      }

    /** `_build_date_range` (elastic.py:97-116). */
    private[sources] def dateRange(field: String, fromMs: Option[Long],
        toMs: Option[Long]): Option[J] =
      if (fromMs.isEmpty && toMs.isEmpty) None
      else Some(JObj(Seq("range" -> JObj(Seq(field -> JObj(
        fromMs.map(f => "gte" -> (JNum(f): J)).toSeq ++
          toMs.map(t => "lt" -> (JNum(t): J)).toSeq :+
          ("format" -> (JStr("epoch_millis"): J))))))))

    /** `_build_aggs` (elastic.py:436-469): per-feature stats /
      * extended_stats (variance family), script features as painless. */
    private[sources] def buildAggs(features: Seq[Feature]): Seq[(String, J)] =
      features.map { feature =>
        val metric = feature.metric match {
          case "mean" | "average" => "avg"
          case m                  => m
        }
        val subAgg =
          if (metric == "std_deviation" || metric == "variance")
            "extended_stats"
          else "stats"
        val inner: J = feature.script match {
          case Some(script) => JObj(Seq("script" -> JObj(Seq(
            "lang" -> JStr("painless"), "inline" -> JStr(script)))))
          case None => JObj(Seq("field" -> JStr(feature.field)))
        }
        feature.name -> JObj(Seq(subAgg -> inner))
      }.sortBy(_._1) // `for x in sorted(aggs)` — elastic.py:527

    /** `_build_times_query` (elastic.py:471-530): the date_histogram
      * body with extended_bounds, UTC keys, per-feature sub-aggs, and
      * the bool/must filter when a date range or match_all exists.
      * (the [[J]] AST above is shared by [[Mongo]]'s pipeline builder) */
    def timesQuery(
        bucketInterval: Long,
        features: Seq[Feature],
        fromMs: Option[Long],
        toMs: Option[Long],
        timestampField: String = "timestamp"): String = {
      val bounds = JObj(
        fromMs.map(f => "min" -> (JNum(f): J)).toSeq ++
          toMs.map(t => "max" -> (JNum(t - 1000 * bucketInterval): J)).toSeq)
      val histogram = JObj(Seq(
        "date_histogram" -> JObj(Seq(
          "field" -> JStr(timestampField),
          "extended_bounds" -> bounds,
          "interval" -> JStr(s"${bucketInterval}s"),
          "min_doc_count" -> JNum(0),
          "time_zone" -> JStr("UTC"),
          "format" -> JStr("yyyy-MM-dd'T'HH:mm:ss'Z'"),
          "order" -> JObj(Seq("_key" -> JStr("asc"))))),
        "aggs" -> JObj(buildAggs(features))))
      val must = dateRange(timestampField, fromMs, toMs).toSeq ++
        features.flatMap(f => matchAllConditions(f.matchAll))
      val body = JObj(
        Seq("size" -> (JNum(0): J),
          "aggs" -> (JObj(Seq("histogram" -> histogram)): J)) ++
          (if (must.nonEmpty)
            Seq("query" -> (JObj(Seq("bool" -> JObj(Seq(
              "must" -> JArr(must))))): J))
          else Nil))
      body.render
    }
  }

  /** WarpScript generation (/root/reference/loudml/warp10.py:28-50,
    * 86-94, 147-189): the `[FETCH] BUCKETIZE` script per feature,
    * concatenated into one multi-fetch. */
  object Warp10 {

    /** `check_tag` (warp10.py:28-30): Warp10 tags must be strings. */
    private def checkTag(k: String, v: Any): (String, String) = v match {
      case s: String => (k, s)
      case _ => throw new IllegalArgumentException(
        "warp10: tags key/value must be strings")
    }

    /** `build_tags` (warp10.py:38-42): `{ 'k' 'v',... }` — note the
      * double space when empty, exactly as `"{{ {} }}".format('')`. */
    def buildTags(tags: Seq[(String, String)]): String =
      "{ " + tags.map { case (k, v) => s"'$k' '$v'" }.mkString(",") + " }"

    /** `metric_to_bucketizer` (warp10.py:45-50). */
    def metricToBucketizer(metric: String): String =
      "bucketizer." + (if (metric == "avg") "mean" else metric)

    /** `build_name` / `build_selector` (warp10.py:86-94). */
    def buildSelector(globalPrefix: Option[String], name: String,
        isRegexp: Boolean = false): String = {
      val n = globalPrefix.fold(name)(p => s"$p.$name")
      if (isRegexp) "~" + n else n
    }

    /** `build_fetch` (warp10.py:147-164). */
    def buildFetch(readToken: String, globalPrefix: Option[String],
        feature: Feature, fromStr: String, toStr: String,
        tags: Seq[(String, String)] = Nil): String = {
      val allTags = tags ++ feature.matchAll.map {
        case (k, v) => checkTag(k, v)
      }
      s"[\n'$readToken'\n'${buildSelector(globalPrefix, feature.field)}'\n" +
        s"${buildTags(allTags)}\n'$fromStr'\n'$toStr'\n]\nFETCH"
    }

    /** `build_multi_fetch` (warp10.py:166-189): one BUCKETIZE block per
      * feature; bucket span in µs. */
    def buildMultiFetch(readToken: String, globalPrefix: Option[String],
        bucketInterval: Double, features: Seq[Feature],
        fromStr: String, toStr: String,
        tags: Seq[(String, String)] = Nil): String = {
      val span = (bucketInterval * 1e6).toLong
      val scripts = features.map { f =>
        s"[\n${buildFetch(readToken, globalPrefix, f, fromStr, toStr, tags)}\n" +
          s"${metricToBucketizer(f.metric)}\n0\n$span\n0\n]\nBUCKETIZE"
      }
      s"[\n${scripts.mkString("\n")}\n]"
    }
  }

  /** MongoDB aggregation-pipeline generation
    * (/root/reference/loudml/mongo.py:29-73): `$match`/`$bucket` stages
    * per feature, rendered with [[ElasticDsl]]'s ordered JSON AST. */
  object Mongo {
    import ElasticDsl.{J, JArr, JBool, JNull, JNum, JObj, JStr}

    private def tk(key: String): String = "$" + key

    private def jVal(v: Any): J = v match {
      case s: String  => JStr(s)
      case i: Int     => JNum(i.toLong)
      case l: Long    => JNum(l)
      case b: Boolean => JBool(b)
      case other      => JStr(other.toString)
    }

    /** `_build_query` (mongo.py:33-73): optional `$or` tag match, the
      * count form with its `$exists` guard, otherwise one `$bucket`
      * stage with the metric accumulator (mean→avg). Returns the
      * rendered pipeline (a JSON array of stages). */
    def timesPipeline(feature: Feature, timestampField: String,
        boundaries: Seq[Long]): String = {
      val groupBy = JStr(tk(timestampField))
      val bounds = JArr(boundaries.map(b => JNum(b): J))
      val matchStage: Seq[J] =
        if (feature.matchAll.isEmpty) Nil
        else Seq(JObj(Seq("$match" -> JObj(Seq("$or" -> JArr(
          feature.matchAll.map { case (k, v) =>
            JObj(Seq(k -> jVal(v))): J }))))))
      val stages: Seq[J] =
        if (feature.metric == "count")
          matchStage ++ Seq(
            JObj(Seq("$match" -> JObj(Seq(
              feature.field -> JObj(Seq("$exists" -> JBool(true))))))),
            JObj(Seq("$bucket" -> JObj(Seq(
              "groupBy" -> groupBy,
              "boundaries" -> bounds,
              "default" -> JNull,
              "output" -> JObj(Seq(
                feature.name -> JObj(Seq("$sum" -> JNum(1))))))))))
        else {
          val metric = if (feature.metric == "mean") "avg" else feature.metric
          matchStage ++ Seq(JObj(Seq("$bucket" -> JObj(Seq(
            "groupBy" -> groupBy,
            "boundaries" -> bounds,
            "default" -> JNull,
            "output" -> JObj(Seq(feature.name -> JObj(Seq(
              tk(metric) -> JStr(tk(feature.field)))))))))))
        }
      JArr(stages).render
    }
  }
}
