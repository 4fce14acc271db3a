package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth law for the s16 batch IVF kNN join: corpus fixed (the sf
  * embeddings table), query side ×f by replication with fresh
  * query_ids (same vectors — what's being measured is the join's
  * growth in the query dimension, where the broadcast form's cost
  * would be replicated-queries × tasks). Expect wall ~linear in f and
  * the candidate count EXACTLY linear (each replica probes the same
  * cells: candidates = f × Σ_q Σ_{probed cells} |cell| − self-matches,
  * the queries·nprobe·corpus/cells law with no cross-replica term).
  *
  * Run: sbt "runMain graft.tools.ProfileS16 /root/testdata/sf0.1 1,4,16 3"
  * Results: SCALE.md round-17; log under bench_runs/profile_r17/.
  */
object ProfileS16 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,4,16").split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(2).getOrElse("3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCorpus = corpus.count()
    println(s"corpus=$nCorpus")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println("factor,queries,out_rows,med_s,runs")
    for (f <- factors) {
      val queries = corpus.crossJoin(
          spark.range(f).select(col("id").as("rep")))
        .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
          col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nq = queries.count()
      val runs = (1 to reps).map { _ =>
        time {
          graft.functions.SimilarityFunctions
            .ivfKnnJoin(corpus, queries, "vec_id", "embedding",
              k = 3, centroids = 16, nprobe = 2)
            .count()
        }
      }
      require(runs.map(_._1).distinct.size == 1, s"nondeterministic at f=$f")
      println(f"$f,$nq,${runs.head._1},${med(runs.map(_._2))}%.3f,${runs.map(r => f"${r._2}%.2f").mkString("|")}")
      queries.unpersist()
    }
    spark.stop()
  }
}
