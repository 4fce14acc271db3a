package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables._
import graft.functions.DedupFunctions._

/** Growth-law measurement for d9 decontamination alone, after the
  * round-12 shingle-kernel rewrite (same replica synthesis and fixed
  * benchmark slice as [[ProfileScale]]'s d9 cell, extracted so the
  * post-rewrite law can be re-measured without paying the whole
  * text-family pass). Not part of the driver contract; run with
  * `sbt "runMain graft.tools.ProfileD9 /root/testdata/sf0.1 1,3,10"`.
  * Results: SCALE.md round-12 d9 table. */
object ProfileD9 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft_d9")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      if (Files.exists(tmp))
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }

    val base = documents(spark, d).select("doc_id", "text", "source")
    println(s"base corpus: ${base.count()} docs ($d)")

    // identical alphabet-rotation replica synthesis to ProfileScale:
    // bijective char remap = shingle-statistics isomorphism per replica
    def corpusPath(f: Int): String = {
      val p = s"$tmp/docs_x$f"
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val digits = "0123456789"
      def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
      val replicas = (0 until f).map { c =>
        if (c == 0) base
        else base.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper + digits,
            rot(lower, c * 7) + rot(upper, c * 7) + rot(digits, c * 3)).as("text"),
          col("source"))
      }
      replicas.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
      p
    }

    // warm codegen/classloading so factor 1 doesn't carry first-call cost
    decontaminate(base.limit(200), "doc_id", "text",
      col("doc_id") % 50 === 0, 3).count()

    for (f <- factors; rep <- 1 to 3) {
      val docs = spark.read.parquet(corpusPath(f))
      val n = docs.count()
      val bench = col("doc_id") < 10000000L && col("doc_id") % 50 === 0
      val t0 = System.nanoTime()
      val flagged = decontaminate(docs, "doc_id", "text", bench, 3).count()
      val t = (System.nanoTime() - t0) / 1e9
      val grams = docs.filter(size(split(col("text"), " ")) >= 3)
        .select((size(split(col("text"), " ")) - 2).cast("long").as("ng"))
        .agg(sum("ng")).collect()(0).getLong(0)
      println(f"d9 x$f rep$rep  $n%7d docs  ${t}%6.2f s  grams $grams%9d  flagged $flagged%7d")
    }
    spark.stop()
  }
}
