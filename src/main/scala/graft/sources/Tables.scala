package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Named-source registry — the Spark restatement of the reference's "bucket"
  * concept (a named, typed connection to a data store; see
  * /root/reference/loudml/bucket.py:29-74 and the registry at
  * /root/reference/loudml/__init__.py:13-29).
  *
  * In the reference a bucket is a TSDB connection read via `get_times_data`;
  * here a source is anything that yields a DataFrame. Parquet and CSV are
  * built in; callers can register in-memory frames (the MemBucket analog,
  * /root/reference/loudml/membucket.py:78-287).
  *
  * Scale note: parquet scans get predicate pushdown + column pruning from
  * Catalyst for free; at 100 TB the tables would be date-partitioned so the
  * time-range filter in [[graft.operators.TimesQuery]] prunes partitions.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one driver-provided table from a scale-factor directory.
    *
    * The `events` table stores TIMESTAMP(NANOS) which Spark 4 refuses by
    * default; we read nanos as long (legacy conf) and rebuild a
    * microsecond-precision timestamp with exact integer division — no
    * double roundtrip, so bucket/filter boundaries stay exact.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        // keep the raw nanos column: a literal predicate on it pushes to
        // the parquet scan (row-group pruning), which the derived
        // timestamp_micros(...) expression cannot — TimesQuery adds the
        // redundant pushable range filter on `ts_nanos` automatically
        d.withColumn("ts_nanos", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case (d, _) => d
    }
  }

  /** CSV ingest mirroring the reference's CSV bucket loader
    * (/root/reference/loudml/membucket.py:90-112): header row, configurable
    * delimiter, numeric coercion with string fallback handled by schema
    * inference. Handles .gz transparently (Spark codec auto-detect).
    */
  def loadCsv(spark: SparkSession, path: String, delimiter: String = ";"): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .option("inferSchema", "true")
      .csv(path)

  /** Register every table as a temp view so spark.sql(...) works. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
