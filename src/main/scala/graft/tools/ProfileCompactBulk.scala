package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.PartitionedStore

/** A/B the compact bulk arm (r18) against the pooled per-partition
  * path at a partition count where dispatch dominates: `parts`
  * partitions × `appends` small files each (the post-micro-batch
  * shape that flags hundreds of partitions at once), compacted with
  * bulkThreshold = ∞ (pooled) vs 1 (bulk).
  *
  * Run: sbt "runMain graft.tools.ProfileCompactBulk 300 4"
  * Results: SCALE.md round-18; log bench_runs/profile_r18/. */
object ProfileCompactBulk {
  def main(args: Array[String]): Unit = {
    val parts = args.headOption.map(_.toInt).getOrElse(300)
    val appends = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def mk(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_compab").toString
      for (b <- 0 until appends)
        (0L until parts.toLong * 20L)
          .map(i => (b * 1000000L + i, i % parts, s"payload-$b-$i"))
          .toDF("id", "cell", "payload")
          .repartition(col("cell"))
          .write.mode("append").partitionBy("cell").parquet(dir)
      dir
    }
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(s"parts=$parts files/part=$appends")
    for ((label, thr) <- Seq(("pooled-8", Int.MaxValue), ("bulk", 1))) {
      val dir = mk()
      val t = time(PartitionedStore.compact(spark,
        new org.apache.hadoop.fs.Path(dir), "cell", minFiles = 2,
        parallelism = 8, bulkThreshold = thr))
      val n = spark.read.parquet(dir).count()
      println(f"$label%-10s $t%8.2f s   rows=$n")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    spark.stop()
  }
}
