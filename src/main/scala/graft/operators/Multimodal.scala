package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract stages (BASELINE.json north
  * star).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`decodeStub`); everything around it —
  * schema (binary + metadata struct), partition-sized batch iteration via
  * `mapPartitions`, fixed-width feature output with a real Encoder — is the
  * production plumbing and is tested. Swapping the stub for a real codec
  * changes one function.
  *
  * Scale notes: blobs never pass through a shuffle here (all stages are
  * narrow maps); at 100 TB you'd store blobs in parquet binary columns
  * (or pointers to object storage) partitioned so `maxPartitionBytes`
  * keeps task inputs bounded, and feature extraction stays embarrassingly
  * parallel.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("data", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = true),
      StructField("kind", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Wrap a text column as a fake media blob (UTF-8 bytes) with metadata —
    * stands in for image/audio bytes in tests. */
  def attachBlob(df: DataFrame, idCol: String, textCol: String,
      kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("data"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit(kind).as("kind"),
        lit(64).as("width"),
        lit(64).as("height")).as("meta"))

  /** STUB decode: a real implementation would decode image bytes to
    * pixels here (no codec libs in this container). The stub derives a
    * deterministic 8-value "feature vector" from the raw bytes so the
    * downstream plumbing (batching, schema, joins with embeddings) is
    * exercised with stable values: f_i = mean of bytes ≡ i (mod 8),
    * normalized to [0,1]. Features are Double (exact integer-sum math →
    * DuckDB-oracle-equal); a real codec would emit float32 — swap the
    * element type with the codec.
    *
    * Dataset-typed `mapPartitions` (Encoders.row), not `df.rdd`: rows stay
    * in Tungsten binary format end-to-end, no RDD round-trip. The
    * partition is the batch unit (the mapInPandas analog); a real codec
    * would init once per partition here.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType), nullable = true))
    val dataIdx = df.schema.fieldIndex("data")
    df.mapPartitions { it =>
      // per-partition (batch) codec init would go here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](dataIdx)
        val feats: Array[Double] =
          if (bytes == null) null
          else {
            val sums = new Array[Long](8)
            val counts = new Array[Long](8)
            var i = 0
            while (i < bytes.length) {
              sums(i % 8) += bytes(i) & 0xff
              counts(i % 8) += 1
              i += 1
            }
            Array.tabulate(8)(j =>
              if (counts(j) == 0) 0.0
              else sums(j).toDouble / counts(j) / 255.0)
          }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame sampling: cut `n` evenly-spaced fixed-width byte windows from
    * the blob (video-frame-sampling shape; windows of real codecs would
    * be keyframes). Pure Column ops — `substring` on binary is codegen'd. */
  def frameSample(df: DataFrame, n: Int, frameBytes: Int = 16): DataFrame = {
    val frames = (0 until n).map { i =>
      struct(lit(i).as("frame_no"),
        expr(s"substring(data, cast(meta.n_bytes * $i / $n as int) + 1, $frameBytes)")
          .as("frame"))
    }
    df.select(col("media_id"), explode(array(frames: _*)).as("f"))
      .select(col("media_id"), col("f.frame_no").as("frame_no"),
        col("f.frame").as("frame"))
  }
}
