package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bucket (data source/sink) seam — Spark restatement of the
  * reference's abstract `Bucket` (/root/reference/loudml/bucket.py:29-74:
  * named, typed connection hiding vendor logic; read via the bucketed-agg
  * contract, write via buffered point inserts) and its plugin registry
  * (`load_bucket`, /root/reference/loudml/bucket.py:297-306; entry points
  * /root/reference/loudml/__init__.py:13-41).
  *
  * A [[Bucket]] yields a *points frame* — `timestampField` plus field/tag
  * columns — which [[graft.operators.TimesQuery]] turns into bucketed
  * series; the seven network TSDB connectors of the reference are
  * unreachable here (no network), but they would implement exactly this
  * trait. Writes go through [[graft.io.WriteBack.save]]-style appends.
  */
trait Bucket {
  def name: String
  /** Field used for time filtering/bucketing
    * (bucket.py:63-68 `timestamp_field`, default "timestamp"). */
  def timestampField: String = "timestamp"
  /** The points frame (lazy plan — no scan happens here). */
  def readPoints(spark: SparkSession): DataFrame
  /** Append points (the `insert_times_data` + commit path). */
  def writePoints(df: DataFrame): Unit =
    throw new UnsupportedOperationException(s"bucket '$name' is read-only")
  /** Drop the underlying data (bucket.py `drop`). */
  def drop(): Unit =
    throw new UnsupportedOperationException(s"bucket '$name' cannot drop")
}

final case class UnsupportedBucket(name: String)
  extends IllegalArgumentException(s"unknown bucket: $name")

/** Name → bucket registry (the `load_bucket` seam). */
class BucketRegistry {
  private val buckets = scala.collection.concurrent.TrieMap.empty[String, Bucket]
  def register(b: Bucket): Unit = buckets.put(b.name, b)
  def apply(name: String): Bucket =
    buckets.getOrElse(name, throw UnsupportedBucket(name))
  def names: Seq[String] = buckets.keys.toSeq.sorted
}

/** Parquet-backed bucket (the 100 TB shape: date-partitioned parquet with
  * pushdown + pruning). `path` may be a partitioned directory. */
final class ParquetBucket(
    val name: String, path: String,
    override val timestampField: String = "ts") extends Bucket {
  def readPoints(spark: SparkSession): DataFrame = spark.read.parquet(path)
  override def writePoints(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)
}

/** One driver testdata table as a bucket (nanos-ts normalization via
  * [[Tables.load]]). */
final class TestdataBucket(
    val name: String, sfDir: String, table: String,
    override val timestampField: String = "ts") extends Bucket {
  def readPoints(spark: SparkSession): DataFrame = Tables.load(spark, sfDir, table)
}

/** CSV bucket (`nl.csv.gz`-style, membucket.py:90-112). */
final class CsvBucket(
    val name: String, path: String, delimiter: String = ";",
    override val timestampField: String = "timestamp") extends Bucket {
  def readPoints(spark: SparkSession): DataFrame =
    Tables.loadCsv(spark, path, delimiter)
}

/** In-memory bucket (the MemBucket analog, membucket.py:78-287): points
  * accumulate in a buffer; the frame is rebuilt on read. Test/dev scale. */
final class MemBucket(
    val name: String,
    schema: org.apache.spark.sql.types.StructType,
    override val timestampField: String = "timestamp") extends Bucket {
  private val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
  def readPoints(spark: SparkSession): DataFrame = synchronized {
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .BufferHasAsJava(rows).asJava), schema)
  }
  override def writePoints(df: DataFrame): Unit = synchronized {
    rows ++= df.collect()
  }
  def insert(row: org.apache.spark.sql.Row): Unit = synchronized { rows += row }
  override def drop(): Unit = synchronized { rows.clear() }
}
