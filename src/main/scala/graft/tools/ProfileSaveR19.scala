package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 save-phase decomposition (VERDICT r18 item #5): the twin
  * partitioned write is the largest remaining phase of the band-store
  * bundles (d16 save 3.3 s, d16b save 5.0 s of 8.8/9.1 s walls).
  * Times each piece of BandIndex.save separately — shingle compute,
  * minhash+banding, the two shuffles, the two writes (noop vs real) —
  * at the d16 shape (5000 docs, prefixLen=1) and the d16b shape
  * (460 docs incl. a 400-doc flood, prefixLen=2, ~100+ bucket dirs).
  *
  * Run: sbt "runMain graft.tools.ProfileSaveR19 /root/testdata/sf0.1 5"
  */
object ProfileSaveR19 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("5").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.DedupFunctions.{wordShingles, bandKeys}
    import graft.expressions.HashExpressions.minhash_signature

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text")
    val bg = docs.filter(col("doc_id") < 60)
    val flood = bg.filter(col("doc_id") === 7).select("text")
      .crossJoin(spark.range(0, 400).select((col("id") + 80000L).as("doc_id")))
      .select("doc_id", "text")
    val d16b = bg.unionByName(flood)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def variant(name: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map(_ => time(body))
      println(f"$name%-28s med=${med(ts)}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def fresh(): String =
      java.nio.file.Files.createTempDirectory("graft_psr19").toString
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def pieces(tag: String, src: DataFrame, pfx: Int, idb: Int): Unit = {
      val sh = src.select(col("doc_id").as("id"),
        wordShingles(col("text"), 3).as("sh")).filter(col("sh").isNotNull)
      val banded = sh.withColumn("band", explode(bandKeys(
          minhash_signature(col("sh"), 64, "md5"), 16, 4)))
        .select(col("id"), col("band"),
          substring(col("band"), 1, pfx).as("bucket"))
      val withSb = sh.withColumn("sbucket",
        pmod(xxhash64(col("id")), lit(idb.toLong)))
      variant(s"$tag shingle_noop")(noop(sh))
      variant(s"$tag minhash_band_noop")(noop(banded))
      variant(s"$tag bands_shuffle_noop")(noop(
        banded.repartition(col("bucket"))))
      variant(s"$tag bands_write") {
        val dir = fresh()
        banded.repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      variant(s"$tag bands_write_split") {
        val dir = fresh()
        banded.repartition(col("bucket"),
            pmod(xxhash64(col("id")), lit(4L)))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      variant(s"$tag bands_write_flat") {
        val dir = fresh()
        banded.repartition(col("bucket"))
          .write.mode("overwrite").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      variant(s"$tag bands_write_par_minhash") {
        val dir = fresh()
        val shp = src.select(col("doc_id").as("id"),
          wordShingles(col("text"), 3).as("sh")).filter(col("sh").isNotNull)
          .repartition(32)
        shp.withColumn("band", explode(bandKeys(
            minhash_signature(col("sh"), 64, "md5"), 16, 4)))
          .select(col("id"), col("band"),
            substring(col("band"), 1, pfx).as("bucket"))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      variant(s"$tag bands_write_manyfiles") {
        val dir = fresh()
        banded.repartition(240)
          .write.mode("overwrite").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      variant(s"$tag bands_write_1task") {
        val dir = fresh()
        banded.coalesce(1)
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      variant(s"$tag bands_write_committerv2") {
        val hc = spark.sparkContext.hadoopConfiguration
        hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
        val dir = fresh()
        banded.repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        hc.set("mapreduce.fileoutputcommitter.algorithm.version", "1")
      }
      for (codec <- Seq("snappy", "uncompressed")) variant(s"$tag bands_write_$codec") {
        val dir = fresh()
        banded.repartition(col("bucket"))
          .write.mode("overwrite").option("compression", codec)
          .partitionBy("bucket").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      for (bs <- Seq(1 << 20, 4 << 20)) variant(s"$tag bands_write_bs${bs >> 20}m") {
        val dir = fresh()
        banded.repartition(col("bucket"))
          .write.mode("overwrite").option("parquet.block.size", bs.toString)
          .partitionBy("bucket").parquet(s"$dir/bands")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      variant(s"$tag shingles_write") {
        val dir = fresh()
        withSb.repartition(col("sbucket"))
          .write.mode("overwrite").partitionBy("sbucket").parquet(s"$dir/shingles")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }

    pieces("d16", docs, 1, 8)
    pieces("d16b", d16b, 2, 8)
    spark.stop()
  }
}
