package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pooled-vs-bulk A/B at FIXTURE-SCALE touched-partition counts — the
  * small-N points the r18 build session never measured (it measured
  * 299 / 3 993 touched and ASSUMED "pooled wins while touched ≲ 100"
  * from dispatch arithmetic; the bench-visible lifecycles touch 4–24
  * partitions and pay ~3 driver-dispatched jobs per partition on the
  * pooled path — 83 jobs of d21's 152 are its vacuum). Shapes:
  *
  *  - band d21: 2000 docs, prefixLen=1 (16 buckets) + 8 sbuckets,
  *    delete id%9==4 → every partition touched (24).
  *  - ann bounded: 5000 vecs, 16 cells, delete 2 cells' members
  *    → 2 touched (the ProfileDeleteScale bounded arm's shape).
  *
  * Each rep rebuilds the store + tombstones (untimed) and times ONLY
  * `PartitionedStore.rewriteExcludingAll` under the given threshold
  * (pooled = threshold past the count; bulk = threshold 1).
  *
  * Run: sbt "runMain graft.tools.ProfileMaintSmall /root/testdata/sf0.1 3"
  * Results: OPTIMIZATION_r18.md; log under bench_runs/profile_r18/.
  */
object ProfileMaintSmall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{AnnIndex, BandIndex, PartitionedStore}
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def fresh(): String =
      java.nio.file.Files.createTempDirectory("graft_maint").toString
    def drop(dir: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 2000)
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    // --- band-store vacuum rewrite at the d21 shape (24 touched)
    def bandArm(threshold: Int): Double = {
      val dir = fresh()
      BandIndex.save(docs, "doc_id", "text", shingleN = 3, numHashes = 64,
        bands = 16, dir = dir, prefixLen = 1, idBuckets = 8)
      BandIndex.deleteIds(spark,
        dir, docs.filter(col("doc_id") % 9 === 4).select("doc_id"),
        "doc_id", "del-1")
      val toms = PartitionedStore.readTombstones(spark, dir).get
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toms.count()
      val fsRoot = new org.apache.hadoop.fs.Path(s"$dir/bands")
      val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bandVals = PartitionedStore.partitions(fs, fsRoot, "bucket")
        .map(_.getName.stripPrefix("bucket="))
      val shRoot = new org.apache.hadoop.fs.Path(s"$dir/shingles")
      val shVals = PartitionedStore.partitions(fs, shRoot, "sbucket")
        .map(_.getName.stripPrefix("sbucket="))
      val t = time {
        PartitionedStore.rewriteExcludingAll(spark, fsRoot, "bucket",
          bandVals, toms, "id", 16, threshold)
        PartitionedStore.rewriteExcludingAll(spark, shRoot, "sbucket",
          shVals, toms, "id", 16, threshold)
      }
      toms.unpersist()
      drop(dir)
      t
    }

    // --- ann vacuum rewrite, bounded arm (2 touched cells)
    def annArm(threshold: Int): Double = {
      val dir = fresh()
      AnnIndex.ivfIndexSave(vecs, "vec_id", "embedding", cells = 16, dir = dir)
      val cellOf = spark.read.parquet(s"$dir/codes")
        .filter(col("cell") < 2).select(col("id").as("vec_id"))
      AnnIndex.deleteIds(spark, dir, cellOf, "vec_id", "del-1")
      val toms = PartitionedStore.readTombstones(spark, dir).get
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toms.count()
      val root = new org.apache.hadoop.fs.Path(s"$dir/codes")
      val t = time {
        PartitionedStore.rewriteExcludingAll(spark, root, "cell",
          Seq("0", "1"), toms, "id", 16, threshold)
      }
      toms.unpersist()
      drop(dir)
      t
    }

    def ab(name: String, arm: Int => Double): Unit = {
      // warm both paths once (JIT/codegen), uncounted
      arm(1000); arm(1)
      val pooled = (1 to reps).map(_ => arm(1000))
      val bulk = (1 to reps).map(_ => arm(1))
      println(f"$name pooled med=${med(pooled)}%.3f all=${pooled.map(t => f"$t%.2f").mkString(",")}")
      println(f"$name bulk   med=${med(bulk)}%.3f all=${bulk.map(t => f"$t%.2f").mkString(",")}")
    }
    ab("band_d21_24touched", bandArm)
    ab("ann_bounded_2touched", annArm)
    spark.stop()
  }
}
