package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MultimodalFunctions._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("media metadata struct + metadata-only resize (no payload touch)") {
    val df = Seq(("doc1", "payload-bytes-here")).toDF("id", "txt")
      .withColumn("payload", asPayload(col("txt")))
      .withColumn("meta", mediaMeta("png", 640, 480))
    val resized = resizeMeta(df, "meta", 64, 64)
    val r = resized.select("meta.format", "meta.width", "meta.height").head()
    assert((r.getString(0), r.getInt(1), r.getInt(2)) == ("png", 64, 64))
    // payload untouched
    assert(resized.select(md5(col("payload"))).head().getString(0) ==
      df.select(md5(col("payload"))).head().getString(0))
  }

  test("decodeFeatures emits the documented schema with deterministic stub features") {
    val df = Seq((7L, "abc")).toDF("doc_id", "txt")
      .withColumn("payload", asPayload(col("txt")))
    val out = decodeFeatures(df, "doc_id", "payload")
    assert(out.schema == decodedSchema)
    val row = out.head()
    assert(row.getLong(0) == 7L && row.getInt(1) == 3)
    val feats = row.getAs[scala.collection.Seq[Float]](2)
    assert(feats.size == 8 && feats.forall(f => f >= 0.0f && f <= 1.0f))
    // deterministic: same payload, same features
    assert(decodeFeatures(df, "doc_id", "payload").head().getAs[scala.collection.Seq[Float]](2) == feats)
  }

  test("sampleFrames covers the payload with the configured stride") {
    val txt = "x" * 300
    val df = Seq((1L, txt)).toDF("doc_id", "txt")
      .withColumn("payload", asPayload(col("txt")))
    val frames = sampleFrames(df, "doc_id", "payload", frameBytes = 64, stride = 2)
    val rows = frames.orderBy("frame_no").collect()
    assert(rows.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 1))
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length <= 64))
  }
}
