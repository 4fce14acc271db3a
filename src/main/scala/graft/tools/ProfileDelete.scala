package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost shape of the tombstone-delete arms (s17/d21): (a) the probe
  * MASK — wall of an AnnIndex probe with 0 / small / large committed
  * tombstone sets (the anti-join rides inside the pruned cell scan,
  * so its cost should track the tombstone relation, never the store),
  * and (b) the VACUUM — wall vs number of deleted ids, which drives
  * affected-partition count until every partition is touched and
  * data-proportional rewrite work after that.
  *
  * Corpus = sf embeddings ×R replicas (fresh ids), IVF-flat,
  * cells = 64 so partial-vacuum points exist below full coverage.
  *
  * Run: sbt "runMain graft.tools.ProfileDelete /root/testdata/sf0.1 16 3"
  * Results: SCALE.md round-17; log under bench_runs/profile_r17/.
  */
object ProfileDelete {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rFactor = args.lift(1).getOrElse("16").toInt
    val reps = args.lift(2).getOrElse("3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.AnnIndex

    val base = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = base.crossJoin(spark.range(rFactor).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    println(s"corpus=$n")
    val queries = base.filter(col("vec_id") < 10)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def probeMed(dir: String): Double = med((1 to reps).map { _ =>
      time(AnnIndex.probe(spark, dir, queries, "vec_id", "embedding",
        k = 5, nprobe = 4).count())._2
    })

    val dir = java.nio.file.Files.createTempDirectory("graft_profdel").toString
    AnnIndex.ivfIndexSave(corpus, "vec_id", "embedding", cells = 64, dir = dir)

    println("point,tombstones,probe_med_s,vacuum_s,cells_rewritten")
    println(f"mask0,0,${probeMed(dir)}%.3f,,")
    // small delete: 1/1024 of the corpus
    AnnIndex.deleteIds(spark, dir,
      corpus.filter(col("vec_id") % 1024 === 7).select("vec_id"), "vec_id", "small")
    val nSmall = n / 1024
    println(f"mask_small,$nSmall,${probeMed(dir)}%.3f,,")
    // large delete: ~1/4 of the corpus on top
    AnnIndex.deleteIds(spark, dir,
      corpus.filter(col("vec_id") % 4 === 1).select("vec_id"), "vec_id", "large")
    println(f"mask_large,${n / 4 + nSmall},${probeMed(dir)}%.3f,,")
    val (cells, vt) = time(AnnIndex.vacuumDeletes(spark, dir))
    println(f"vacuum_large,${n / 4 + nSmall},${probeMed(dir)}%.3f,$vt%.3f,${cells.size}")
    // post-vacuum probe equals the mask0-minus-deleted cost shape
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
