package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus the
  * partition-batched decode/feature-extract plumbing a real pipeline
  * needs (SURVEY parity-plus; the container has no image/audio codecs,
  * so the decode kernel is a clearly-marked deterministic STUB — the
  * Spark-side schema, partitioning, batch iteration, and encoder
  * plumbing are real).
  *
  * Scale shape: payloads never leave their partition — decode is
  * `mapPartitions` (one codec init per partition, streaming batches),
  * metadata-only operations are pure column expressions.
  */
object MultimodalFunctions {

  /** Metadata struct convention for a media column. */
  def mediaMeta(format: String, width: Int, height: Int): org.apache.spark.sql.Column =
    struct(lit(format).as("format"), lit(width).as("width"), lit(height).as("height"))

  /** Wrap a text column as a binary payload (fixture builder: stands in
    * for reading real image/audio bytes). */
  def asPayload(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    encode(c, "UTF-8")

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("feat", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode kernel: a real implementation would initialize a codec
    * per partition and decode each payload batch (image decode, audio
    * PCM, video frame-sample). The stub derives 8 deterministic float
    * features from the md5 of the payload so tests and oracles can
    * verify the plumbing end-to-end. */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(payload).take(8).map(b => ((b & 0xff) / 255.0).toFloat)
  }

  /** Partition-batched decode: `mapPartitions` over (id, payload) rows.
    * One kernel instance per partition; rows stream through without
    * materializing the partition. */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rows = input.rdd.mapPartitions { it =>
      // (real pipeline: init codec here, once per partition)
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        Row(id, payload.length, stubDecode(payload))
      }
    }
    spark.createDataFrame(rows, decodedSchema)
  }

  /** Metadata-only resize: pure column expression (no payload touch). */
  def resizeMeta(df: DataFrame, metaCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(metaCol, struct(
      col(s"$metaCol.format").as("format"),
      lit(w).as("width"), lit(h).as("height")))

  /** Frame sampling plumbing for "video" payloads: emit every `stride`-th
    * fixed-size window of the payload as one frame row (explode of a
    * computed offset sequence — the real kernel would seek keyframes). */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameBytes: Int, stride: Int): DataFrame =
    df.select(col(idCol), col(payloadCol))
      .withColumn("frame_no",
        explode(sequence(lit(0), greatest(
          ((octet_length(col(payloadCol)) - lit(frameBytes)) / lit(frameBytes * stride)).cast("int"),
          lit(0)))))
      .withColumn("frame",
        col(payloadCol).substr(col("frame_no") * lit(frameBytes * stride) + 1, lit(frameBytes)))
      .drop(payloadCol)
}
