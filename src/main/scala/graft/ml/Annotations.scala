package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Annotation windows (known-anomaly periods stored in a side table) —
  * /root/reference/loudml/bucket.py:255-294, influx impl
  * /root/reference/loudml/influx.py:616-694. Used to (a) list anomalies in
  * a range and (b) exclude/mask abnormal buckets during training
  * (`_format_windows`, /root/reference/loudml/donut.py:170-178).
  *
  * Windows tables are tiny (human-labeled events) → every join here is a
  * broadcast; the bucketed side streams through unchanged. The overlap
  * predicate is a range join, executed as BroadcastNestedLoopJoin — fine
  * because the broadcast side is O(annotations).
  */
object Annotations {

  /** Annotations whose window intersects [from, to[ —
    * `list_anomalies` (/root/reference/loudml/influx.py:662-694). */
  def inRange(annotations: DataFrame, from: Long, to: Long): DataFrame =
    annotations.filter(col("start_ts") < to && col("end_ts") > from)

  /** Flag buckets that fall inside any window: adds `is_abnormal`.
    * Left range-join against the broadcast windows frame. */
  def flagWindows(buckets: DataFrame, windows: DataFrame): DataFrame = {
    val w = broadcast(windows.select(
      col("start_ts").as("__ws"), col("end_ts").as("__we")))
    buckets.join(w,
        col("bucket") >= col("__ws") && col("bucket") < col("__we"), "left")
      .groupBy(buckets.columns.map(col): _*)
      .agg(max(col("__ws").isNotNull).as("is_abnormal"))
  }

  /** Training-side exclusion: drop abnormal buckets before fitting (the
    * profile-model equivalent of the VAE's abnormal mask,
    * /root/reference/loudml/donut.py:962-987). */
  def excludeWindows(buckets: DataFrame, windows: DataFrame): DataFrame =
    flagWindows(buckets, windows).filter(!col("is_abnormal")).drop("is_abnormal")

  /** Training-side MASK: null the value inside known-anomaly windows but
    * keep the rows — the faithful analog of the VAE's abnormal mask
    * (`_format_windows` marks entries missing and imputation fills them,
    * /root/reference/loudml/donut.py:170-178,962-987). Masking beats
    * dropping for window models: the spine stays complete so row-offset
    * lags stay time-aligned, null targets fall out of the fit, and null
    * lags impute to slot means. Aggregates (avg/stddev) ignore nulls, so
    * profile models get exclusion semantics too. */
  def maskWindows(buckets: DataFrame, windows: DataFrame,
      valueCol: String): DataFrame =
    flagWindows(buckets, windows)
      .withColumn(valueCol,
        when(col("is_abnormal"), lit(null).cast("double"))
          .otherwise(col(valueCol)))
      .drop("is_abnormal")
}
