package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.DedupFunctions._

/** Controlled A/B of the d4b verify pre-filter: same scaled corpus
  * (ProfileScale's rotation-replica synthesis), `jaccardPairs` end to
  * end with the stripe-sketch gate at several widths INCLUDING off
  * (`sketchBits = 0`), reps interleaved so JVM warmth can't favor one
  * arm. The round-8 background ProfileScale run that first measured
  * the gate ran concurrently with `sbt test` and showed 2× regressions
  * on cells that didn't change (d6 f3 11.0 s vs 1.7 s) — this tool
  * exists to produce numbers on an idle machine before the default is
  * chosen.
  *
  * Run: `sbt "runMain graft.tools.ProfileD4b /root/testdata/sf0.1 10 0,512,2048"`
  */
object ProfileD4b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).getOrElse("10").toInt
    val bitsList = args.lift(2).getOrElse("0,2048").split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(3).getOrElse("2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft_d4b")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      if (Files.exists(tmp))
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }

    val base = documents(spark, d).select("doc_id", "text")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    val p = s"$tmp/docs_x$factor"
    (0 until factor).map { c =>
      if (c == 0) base
      else base.select(
        (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
        translate(col("text"), lower + upper + digits,
          rot(lower, c * 7) + rot(upper, c * 7) + rot(digits, c * 3)).as("text"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
    val input = spark.read.parquet(p).filter(length(col("text")) >= 5)
    println(s"corpus: ${input.count()} docs (factor $factor)")

    // warm codegen/classloader once per arm shape
    for (b <- bitsList) {
      val w = jaccardPairs(base.limit(200), "doc_id", "text",
        charShingles(_, 5), 0.4, sketchBits = b)
      w.unpersist(blocking = false)
    }

    for (r <- 1 to reps; b <- bitsList) {
      val t0 = System.nanoTime()
      val pr = jaccardPairs(input, "doc_id", "text", charShingles(_, 5), 0.4,
        sketchBits = b)
      val n = pr.count()
      val secs = (System.nanoTime() - t0) / 1e9
      pr.unpersist(blocking = false)
      println(f"rep $r  sketchBits=$b%-5d  ${secs}%7.1f s  pairs $n%7d")
    }
    spark.stop()
  }
}
