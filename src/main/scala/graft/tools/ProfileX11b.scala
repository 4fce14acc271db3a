package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.DedupFunctions._

/** Round-10 attribution for the x11b regression (r7 best 2.14 s →
  * r9 quiet 3.62 s): A/B the sketch pre-filter (r7 default 2048 bits,
  * r8 default 0) on the word-3-gram containment path, and time the
  * hstat size-estimate job that r8 added. Run:
  *   sbt "runMain graft.tools.ProfileX11b [sfDir]"
  */
object ProfileX11b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("profile-x11b").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    // warm JVM/codegen once
    { val r = containmentPairs(docs, "doc_id", "text", 3, 0.7); r.count(); r.unpersist() }

    for (rep <- 1 to 3) {
      println(s"-- rep $rep --")
      time("sketch=0 (r8+ default)") {
        val r = containmentPairs(docs, "doc_id", "text", 3, 0.7, sketchBits = 0)
        val n = r.count(); r.unpersist(); n
      }
      time("sketch=2048 (r7 default)") {
        val r = containmentPairs(docs, "doc_id", "text", 3, 0.7, sketchBits = 2048)
        val n = r.count(); r.unpersist(); n
      }
      time("sketch=512") {
        val r = containmentPairs(docs, "doc_id", "text", 3, 0.7, sketchBits = 512)
        val n = r.count(); r.unpersist(); n
      }
      // the hstat fixed cost in isolation: same agg shape as the one
      // inside containmentPairs, over an UNCACHED shingle projection
      time("hstat job alone (uncached sh)") {
        val sh = docs.select(col("doc_id"),
          wordShingles(col("text"), 3).as("__sh"))
        val r = sh.agg(count(lit(1)), avg(size(col("__sh")))).head()
        r.getLong(0)
      }
    }
    spark.stop()
  }
}
