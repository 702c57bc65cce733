package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (JSON) column operators.
  *
  * The reference's connectors surface nested payloads as flat fields the
  * query layer addresses by name (ES `_source` documents,
  * `loudml/elastic.py:560-608`; Mongo documents, `loudml/mongo.py:206-256`)
  * — the engine-side equivalent for a Spark pipeline is typed extraction
  * from a JSON string column. Training-data pipelines meet the same shape
  * constantly: crawl metadata, JSONL ingest, event properties.
  *
  * Scale notes:
  *  - `extract` uses ONE `from_json` with an explicit schema and fans the
  *    fields out from the parsed struct — n `get_json_object` calls would
  *    parse the payload n times per row. Single parse, codegen'd
  *    projection, zero shuffles.
  *  - corrupt payloads land as nulls (PERMISSIVE), never task failures —
  *    at 100 TB a malformed record must not kill a stage; callers that
  *    need the reject stream filter `isnull(parsed)` themselves.
  */
object SemiStructured {

  /** Parse `jsonCol` once with `schema` and append each top-level field as
    * a column (existing columns kept). Nulls where the payload is missing,
    * corrupt, or lacks the field.
    *
    * A schema field whose name collides with an existing column is an
    * error: `withColumn` would silently REPLACE the table column with the
    * payload field — at 100 TB that's a corrupted pipeline, not a
    * convenience. Rename in the schema (or project the clash away first). */
  def extract(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val clash = schema.fields.map(_.name).toSet
      .intersect(df.columns.toSet - jsonCol)
    require(clash.isEmpty,
      s"extract: schema field(s) ${clash.mkString(", ")} collide with " +
        "existing columns — extraction would silently overwrite them; " +
        "rename the schema fields or drop/rename the columns first")
    val parsed = from_json(col(jsonCol), schema)
    schema.fields.foldLeft(df.withColumn("__parsed", parsed)) { (d, f) =>
      d.withColumn(f.name, col("__parsed")(f.name))
    }.drop("__parsed")
  }

  /** JSONL round-trip: serialize `cols` of each row to a JSON line
    * (`to_json(struct(...))`), then parse it back with the inferred-from-
    * the-frame schema. The output carries the serialized line plus the
    * re-extracted fields (suffix `_rt`): a pipeline writing shards as
    * JSONL and re-ingesting them exercises exactly this plumbing, and
    * equality `c == c_rt` is the correctness contract.
    *
    * Narrow, zero-shuffle, whole-stage codegen (Jackson under both
    * to_json/from_json). */
  def jsonlRoundtrip(df: DataFrame, cols: Seq[String]): DataFrame = {
    val line = to_json(struct(cols.map(col): _*))
    val schema = StructType(df.select(cols.map(col): _*).schema.fields)
    val withLine = df.withColumn("jsonl", line)
    val parsed = from_json(col("jsonl"), schema)
    cols.foldLeft(withLine.withColumn("__rt", parsed)) { (d, c) =>
      d.withColumn(s"${c}_rt", col("__rt")(c))
    }.drop("__rt")
  }
}
