package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.operators.Feature

/** Offline response-DECODER parity for the reference's network TSDB
  * connectors — the other half of [[ConnectorQueries]]. Each TSDB's
  * `get_times_data` turns a server response into
  * `(time_offset, X[features], timeval)` tuples:
  *
  *  - InfluxDB  /root/reference/loudml/influx.py:549-614 — one
  *    statement result per feature, positional (`j`-indexed) merge;
  *  - Elasticsearch /root/reference/loudml/elastic.py:533-615 —
  *    `aggregations.histogram.buckets[*].<feature.name>.<metric>`;
  *  - OpenTSDB  /root/reference/loudml/opentsdb.py:99-114,427-485 —
  *    one response per feature, `dps` map, `'NaN'` string → missing,
  *    missing count → 0;
  *  - Prometheus /root/reference/loudml/prometheus.py:93-112,336-398 —
  *    `data.result[0].values` pairs, string-encoded numbers;
  *  - Warp10    /root/reference/loudml/warp10.py:192-255 — GTS list,
  *    right-labeled buckets shifted left one interval, extra buckets
  *    skipped, spine-indexed placement;
  *  - MongoDB   /root/reference/loudml/mongo.py:207-256 — aggregate
  *    docs `{_id: bucket_ts, <feature.name>: value}`, spine-indexed,
  *    truncated at the last bucket found.
  *
  * The decoders are Jackson traversals on the DRIVER: a times-query
  * response is bucket-count-sized (the TSDB already aggregated), so it
  * is driver-sized by construction — exactly as the reference iterates
  * it in-process. Bulk data at engine scale goes through the parquet /
  * JDBC paths; these exist so a network-enabled [[Bucket]] can compose
  * builder + HTTP client + decoder with every pure part tested offline.
  *
  * Unit note: the reference's influx path divides a SECONDS delta by
  * 1000 (`influx.py:612`, `str_to_ts` returns seconds —
  * misc.py:160-165) where the ES path correctly divides a millisecond
  * key by 1000. We normalize: `time_offset` is SECONDS from the first
  * bucket in every decoder.
  *
  * Missing values decode to SQL NULL (the engine's NaN→null output
  * convention, io/Output.scala), with the reference's special cases
  * kept: OpenTSDB count → 0, Warp10/Mongo raise on fully-empty data.
  */
object ConnectorResponses {

  private val mapper = new ObjectMapper()

  private def parse(body: String): JsonNode = mapper.readTree(body)

  /** Output schema: timestamp (epoch s), time_offset (s from first
    * bucket), one DOUBLE column per feature name, timeval (source's
    * native time label, when it has one). */
  private def schema(features: Seq[Feature]): StructType =
    StructType(
      StructField("timestamp", DoubleType, nullable = false) +:
      StructField("time_offset", DoubleType, nullable = false) +:
      features.map(f => StructField(f.name, DoubleType, nullable = true)) :+
      StructField("timeval", StringType, nullable = true))

  private def toDf(spark: SparkSession, features: Seq[Feature],
      rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema(features))

  private def numOrNull(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isNumber) n.asDouble()
    else { // Prometheus/OpenTSDB encode numbers as strings; 'NaN' = missing
      val s = n.asText()
      if (s == "NaN") null else s.toDouble
    }

  /** Positional bucket merge shared by the Influx/OpenTSDB/Prometheus
    * paths (the reference's `j < len(buckets)` loop): per feature, a
    * sequence of (timeLabel, value) points; bucket j takes its time
    * label from the FIRST feature that reached index j. */
  private def mergePositional(
      features: Seq[Feature],
      perFeature: Seq[Seq[(Any, Any)]] // (timeval, value) per point
      ): Seq[(Any, Array[Any])] = {
    val buckets = scala.collection.mutable.ArrayBuffer.empty[(Any, Array[Any])]
    perFeature.zipWithIndex.foreach { case (points, i) =>
      points.zipWithIndex.foreach { case ((timeval, v), j) =>
        if (j >= buckets.length)
          buckets += ((timeval, Array.fill[Any](features.length)(null)))
        buckets(j)._2(i) = v
      }
    }
    buckets.toSeq
  }

  private def finishRows(features: Seq[Feature],
      buckets: Seq[(Any, Array[Any])], tsOf: Any => Double,
      labelOf: Any => String): Seq[Row] = {
    val t0 = buckets.headOption.map(b => tsOf(b._1))
    buckets.map { case (timeval, xs) =>
      val ts = tsOf(timeval)
      Row.fromSeq(ts +: (ts - t0.get) +: xs.toSeq :+ labelOf(timeval))
    }
  }

  /** InfluxDB `/query` response: `{"results":[{"statement_id":i,
    * "series":[{"columns":[...],"values":[[...],...]}]}]}` — one
    * statement per feature (the builder ';'-joins one InfluxQL query
    * per feature), value column keyed by the feature NAME (the builder
    * aliases `AS "<name>"`). influx.py:549-614. */
  def influxTimesData(spark: SparkSession, body: String,
      features: Seq[Feature]): DataFrame = {
    val results = parse(body).path("results")
    val perFeature = features.zipWithIndex.map { case (f, i) =>
      val series = results.path(i).path("series")
      if (series.isMissingNode || series.size() == 0) Seq.empty[(Any, Any)]
      else {
        val s = series.get(0)
        val cols = s.path("columns").elements().asScala.map(_.asText()).toSeq
        val timeIdx = cols.indexOf("time")
        val valIdx = cols.indexOf(f.name)
        s.path("values").elements().asScala.map { row =>
          val timeval = row.get(timeIdx).asText()
          val v = if (valIdx < 0) null else numOrNull(row.get(valIdx))
          (timeval: Any, v)
        }.toSeq
      }
    }
    def tsOf(t: Any): Double = graft.api.DateMath.parseTs(t.toString, 0L)
    val buckets = mergePositional(features, perFeature)
    toDf(spark, features, finishRows(features, buckets, tsOf, _.toString))
  }

  /** Elasticsearch `_search` response:
    * `aggregations.histogram.buckets[*]` with `key` (epoch ms),
    * `key_as_string`, and per-feature sub-aggs named `<feature.name>`
    * holding `{<metric>: value}`. elastic.py:533-615 (`_get_agg_val` +
    * the date_histogram loop); offsets are (key−t0)/1000 seconds. */
  def elasticTimesData(spark: SparkSession, body: String,
      features: Seq[Feature]): DataFrame = {
    val root = parse(body)
    val buckets = root.path("aggregations").path("histogram").path("buckets")
    val rows = buckets.elements().asScala.toSeq
    val t0 = rows.headOption.map(_.path("key").asLong())
    toDf(spark, features, rows.map { b =>
      val key = b.path("key").asLong()
      val xs = features.map { f =>
        // avg/sum/min/max/... respond as {"value": v}; percentiles and
        // stats sub-metrics respond keyed by metric name — the
        // reference indexes bucket[name][metric], which for the simple
        // metrics ES names "value"
        val agg = b.path(f.name)
        val direct = agg.path(f.metric)
        val v = if (!direct.isMissingNode) direct else agg.path("value")
        numOrNull(v)
      }
      Row.fromSeq((key / 1000.0) +: ((key - t0.get) / 1000.0) +: xs :+
        b.path("key_as_string").asText(null))
    })
  }

  /** OpenTSDB `/api/query` responses, ONE per feature (the reference
    * client posts each subquery separately, opentsdb.py:193-214):
    * `[{"dps": {"<epoch_s>": value, ...}}]`. `'NaN'` → missing;
    * missing count-metric → 0 (opentsdb.py:452-454). dps keys iterate
    * in ascending time order (OpenTSDB emits sorted maps). */
  def opentsdbTimesData(spark: SparkSession, bodies: Seq[String],
      features: Seq[Feature]): DataFrame = {
    require(bodies.length == features.length,
      s"one response per feature: got ${bodies.length} for ${features.length}")
    val perFeature = features.zip(bodies).map { case (f, body) =>
      val root = parse(body)
      if (root.size() == 0) Seq.empty[(Any, Any)]
      else {
        val dps = root.get(0).path("dps")
        dps.properties().asScala.toSeq
          .map(e => (e.getKey.toLong, e.getValue))
          .sortBy(_._1)
          .map { case (ts, vn) =>
            val v0 = numOrNull(vn)
            val v = if (v0 == null && f.metric == "count") 0.0 else v0
            (ts: Any, v)
          }
      }
    }
    def tsOf(t: Any): Double = t.asInstanceOf[Long].toDouble
    val buckets = mergePositional(features, perFeature)
    toDf(spark, features, finishRows(features, buckets, tsOf, _.toString))
  }

  /** Prometheus `query_range` responses, one per feature:
    * `data.result[0].values` = `[[epoch_s, "value"], ...]`
    * (prometheus.py:93-112). Numbers arrive string-encoded. */
  def prometheusTimesData(spark: SparkSession, bodies: Seq[String],
      features: Seq[Feature]): DataFrame = {
    require(bodies.length == features.length,
      s"one response per feature: got ${bodies.length} for ${features.length}")
    val perFeature = features.zip(bodies).map { case (f, body) =>
      val result = parse(body).path("data").path("result")
      if (result.isMissingNode || result.size() == 0) Seq.empty[(Any, Any)]
      else result.get(0).path("values").elements().asScala.map { pair =>
        (pair.get(0).asDouble(): Any, numOrNull(pair.get(1)))
      }.toSeq
    }
    def tsOf(t: Any): Double = t.asInstanceOf[Double]
    val buckets = mergePositional(features, perFeature)
    toDf(spark, features, finishRows(features, buckets, tsOf,
      t => {
        val d = t.asInstanceOf[Double]
        if (d == math.floor(d)) d.toLong.toString else d.toString
      }))
  }

  /** Warp10 `/exec` response for the multi-fetch script:
    * `[[ [{"v": [[ts_us, value], ...]}], ... ]]` — data[0] lists one
    * GTS group per feature. Warp10 labels buckets with the RIGHT edge;
    * the reference shifts left one interval and drops buckets outside
    * [from, to[ (warp10.py:225-243). The spine is materialized for the
    * whole range, NaN (null) where no GTS point landed. */
  def warp10TimesData(spark: SparkSession, body: String,
      features: Seq[Feature], bucketIntervalSec: Long,
      fromTs: Double, toTs: Double): DataFrame = {
    val fromUs = (fromTs * 1e6).toLong
    val toUs = (toTs * 1e6).toLong
    val intervalUs = bucketIntervalSec * 1000000L
    val nBuckets = ((toTs - fromTs) / bucketIntervalSec).toInt
    val grid = Array.fill[Any](nBuckets, features.length)(null)
    var hasData = false
    val data0 = parse(body).path(0)
    features.indices.foreach { i =>
      val item = data0.path(i)
      if (!item.isMissingNode && item.size() > 0) {
        item.get(0).path("v").elements().asScala.foreach { pair =>
          val tsUs = pair.get(0).asLong() - intervalUs // right → left label
          if (tsUs >= fromUs && tsUs < toUs) {
            grid(((tsUs - fromUs) / intervalUs).toInt)(i) =
              numOrNull(pair.get(1))
            hasData = true
          }
        }
      }
    }
    require(hasData, "no data in Warp10 response")
    toDf(spark, features, grid.toIndexedSeq.zipWithIndex.map { case (xs, j) =>
      val ts = fromTs + j.toDouble * bucketIntervalSec
      Row.fromSeq(ts +: (ts - fromTs) +: xs.toSeq :+
        (if (ts == math.floor(ts)) ts.toLong.toString else ts.toString))
    })
  }

  /** MongoDB aggregate results, one JSON array per feature, docs
    * `{"_id": bucket_ts, "<feature.name>": value}` (mongo.py:207-256):
    * spine-indexed placement from the floor/ceil-aligned boundaries,
    * truncated after the LAST bucket that received data. */
  def mongoTimesData(spark: SparkSession, bodies: Seq[String],
      features: Seq[Feature], bucketIntervalSec: Long,
      fromDate: Double, toDate: Double): DataFrame = {
    require(bodies.length == features.length,
      s"one response per feature: got ${bodies.length} for ${features.length}")
    val fromTs =
      math.floor(fromDate / bucketIntervalSec).toLong * bucketIntervalSec
    val toTs =
      math.ceil(toDate / bucketIntervalSec).toLong * bucketIntervalSec
    val nBuckets = ((toTs - fromTs) / bucketIntervalSec).toInt + 1
    val grid = Array.fill[Any](nBuckets, features.length)(null)
    var found = 0
    features.zipWithIndex.foreach { case (f, i) =>
      parse(bodies(i)).elements().asScala.foreach { doc =>
        val idNode = doc.path("_id")
        if (!idNode.isNull && !idNode.isMissingNode) {
          val ts = idNode.asDouble()
          val j = ((ts - fromTs) / bucketIntervalSec).toInt
          grid(j)(i) = numOrNull(doc.path(f.name))
          if (j >= found) found = j + 1
        }
      }
    }
    require(found > 0, "no data in MongoDB response")
    toDf(spark, features,
      grid.toIndexedSeq.take(found).zipWithIndex.map { case (xs, j) =>
        val ts = (fromTs + j.toLong * bucketIntervalSec).toDouble
        Row.fromSeq(ts +: (ts - fromTs.toDouble) +: xs.toSeq :+
          ts.toLong.toString)
      })
  }
}
