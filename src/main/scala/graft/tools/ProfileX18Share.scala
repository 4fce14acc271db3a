package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysisFunctions._

/** Round-10 A/B (advice #8 / verdict #5): do x18 + x18b win from
  * sharing one persisted winnowFps extraction within a bench pass, or
  * does the persist cost eat the saved recompute? Times the PAIR of
  * queries (stats + pairs, the bench-pass shape) both ways. */
object ProfileX18Share {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("profile-x18share").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    // warm
    winnowingFingerprints(docs, "doc_id", "text", 8, 4).count()

    for (rep <- 1 to 3) {
      println(s"-- rep $rep --")
      time("independent (r9 shape)") {
        winnowingFingerprints(docs, "doc_id", "text", 8, 4).count()
        winnowingPairs(docs, "doc_id", "text", 8, 4, minShared = 2, maxDf = 16).count()
      }
      time("shared persisted fps") {
        val fps = winnowFps(docs, "doc_id", "text", 8, 4)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        winnowingFingerprintsFromFps(fps, "doc_id").count()
        winnowingPairsFromFps(fps, minShared = 2, maxDf = 16).count()
        fps.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
