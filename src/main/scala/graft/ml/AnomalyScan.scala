package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The stateful anomaly hysteresis scan — Spark restatement of the
  * reference's `detect_anomalies` state machine
  * (/root/reference/loudml/donut.py:1477-1578):
  *
  *  - score ≥ max_threshold while idle → anomaly STARTS;
  *  - the anomaly stays open while score ≥ min_threshold (hysteresis);
  *  - score < min_threshold → anomaly ENDS;
  *  - a new start within `gracePeriod` seconds of the previous start is
  *    suppressed (no re-alert, /root/reference/loudml/donut.py:1488-1490,
  *    grace measured from the anomaly's start_ts).
  *
  * Implementation: a sequential scan per series. The frame is repartitioned
  * by series key and sorted within partitions by (key, bucket); a single
  * `mapPartitions` pass keeps O(1) state and resets it on key change — no
  * per-group materialization, no driver collect, so a million independent
  * series scan in parallel while each series stays ordered. For the
  * reference's single-series case this degenerates to one task, same as the
  * reference's single-process loop. Streaming variant:
  * `transformWithState` keyed the same way (graft.streaming).
  */
object AnomalyScan {

  /** @return input columns + `anomaly: String` ∈ {"start","ongoing","end",null}
    *         and `is_anomaly: Boolean` (inside an open anomaly). */
  def scan(
      scored: DataFrame,
      scoreCol: String = "score",
      bucketCol: String = "bucket",
      maxThreshold: Double = 99.7,
      minThreshold: Double = 68.0,
      gracePeriodSec: Long = 0L,
      seriesKeys: Seq[String] = Nil): DataFrame = {
    val spark = scored.sparkSession
    val inSchema = scored.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("anomaly", StringType, nullable = true),
      StructField("is_anomaly", org.apache.spark.sql.types.BooleanType, nullable = false)))
    val scoreIdx = inSchema.fieldIndex(scoreCol)
    val bucketIdx = inSchema.fieldIndex(bucketCol)
    val keyIdx = seriesKeys.map(inSchema.fieldIndex)

    val arranged =
      if (seriesKeys.isEmpty) scored.repartition(1).sortWithinPartitions(bucketCol)
      else scored.repartition(seriesKeys.map(col): _*)
        .sortWithinPartitions((seriesKeys.map(col) :+ col(bucketCol)): _*)

    val rdd = arranged.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var open = false                 // anomaly in progress
      var lastStartTs = Long.MinValue  // for grace-period suppression
      it.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; open = false; lastStartTs = Long.MinValue }
        val score = if (r.isNullAt(scoreIdx)) 0.0 else r.getDouble(scoreIdx)
        val ts = r.getLong(bucketIdx)
        var marker: String = null
        if (!open && score >= maxThreshold) {
          if (gracePeriodSec > 0 && lastStartTs != Long.MinValue &&
              ts - lastStartTs < gracePeriodSec) {
            // suppressed re-alert inside grace period: still "in anomaly"
            // semantically but no start event fires
            open = true; marker = "ongoing"
          } else { open = true; lastStartTs = ts; marker = "start" }
        } else if (open && score < minThreshold) {
          open = false; marker = "end"
        } else if (open) marker = "ongoing"
        Row.fromSeq(r.toSeq ++ Seq(marker, open))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
