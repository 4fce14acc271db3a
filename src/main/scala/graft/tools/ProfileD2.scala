package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.DedupFunctions._

/** Scratch stage-level profiler for the MinHash-LSH pipeline (not part
  * of the driver contract; run with
  * `sbt "runMain graft.tools.ProfileD2 /root/testdata/sf0.1"`). */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = documents(spark, d)
    time("warm: docs count")(docs.count())
    val withSh = docs.select(col("doc_id").as("__id"),
      wordShingles(col("text"), 3).as("__sh"))
    time("shingles only")(withSh.count())
    val sig = withSh.withColumn("__sig",
      graft.expressions.HashExpressions.minhash_signature(col("__sh"), 64))
    time("shingles+signature")(sig.select("__id", "__sig").count())
    val banded = sig.withColumn("__band",
      explode(bandKeys(col("__sig"), 16, 4))).select("__id", "__band")
    time("exploded bands")(banded.count())
    time("band self-join distinct") {
      banded.as("x").join(banded.as("y"),
          col("x.__band") === col("y.__band") && col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("a"), col("y.__id").as("b")).distinct().count()
    }
    time("full pipeline (current)") {
      minhashNearDuplicates(docs, "doc_id", "text", 3, 64, 16, 0.8).count()
    }
    spark.stop()
  }
}
