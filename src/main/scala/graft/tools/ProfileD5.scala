package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.SimilarityFunctions.{cosine, dot, l2Norm}

/** Scratch profiler for the d5 brute-force pair scan: is the cost the
  * nested-loop join itself or the per-pair math? Run with
  * `sbt "runMain graft.tools.ProfileD5 /root/testdata/sf0.1"`. */
object ProfileD5 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val raw = embeddings(spark, d).filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding"))
    time("warm scan")(raw.count())
    val e = raw.withColumn("__n", l2Norm(col("embedding")))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") / col("__n")).as("nv"))
    time("join only (count pairs)") {
      e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id")).count()
    }
    time("join + dot + filter (current d5)") {
      e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
        .select(round(dot(col("x.nv"), col("y.nv")), 6).as("cos"))
        .filter(col("cos") >= 0.45).count()
    }
    time("join + cosine on raw floats (no normalize)") {
      raw.as("x").join(raw.as("y"), col("x.vec_id") < col("y.vec_id"))
        .select(round(cosine(col("x.embedding"), col("y.embedding")), 6).as("cos"))
        .filter(col("cos") >= 0.45).count()
    }
    spark.stop()
  }
}
