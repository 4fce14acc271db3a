package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import graft.Tables._
import graft.functions.AnnIndex

/** Measures the persisted-ANN probe LAW for SCALE.md: build the index
  * at ×1/×3/×10 corpus (embedding replicas via the same sign-flip
  * isometry as ProfileScale's s5 block), hold the query set constant,
  * and show probe wall-time follows the PROBED-partition bytes — flat
  * when cells scale with the corpus (the production dial: cell size
  * held constant) — not total index size. Evidence that partition
  * pruning actually happens: per-probe task-level `inputMetrics
  * .bytesRead` (what the scan physically read) next to the index's
  * total bytes from indexStats.
  *
  * Usage: runMain graft.tools.ProfileAnnProbe [sfDir] [factors]
  */
object ProfileAnnProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft_annprobe")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      if (Files.exists(tmp))
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    def measuredBytes[T](f: => T): (T, Long) = {
      Thread.sleep(300); bytesRead.set(0L)
      val r = f
      Thread.sleep(500) // let the listener bus drain
      (r, bytesRead.get())
    }

    val ebase = embeddings(spark, d).select("vec_id", "embedding")
    val en = ebase.count()
    val queries = ebase.filter(col("vec_id") < 10).persist()
    queries.count()
    println(s"base corpus: $en vectors ($d); constant 10-query probe set, nprobe=4")

    for (f <- factors) {
      val reps = (0 until f).map { c =>
        if (c == 0) ebase
        else ebase.select((col("vec_id") + lit(c * 10000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, j) => when((j + c) % 3 === 0, -x).otherwise(x)).as("embedding"))
      }
      val p = s"$tmp/emb_x$f"
      reps.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
      val corpus = spark.read.parquet(p)
      val dir = s"$tmp/annidx_x$f"
      // the production dial: cells ∝ corpus, so per-cell bytes stay
      // ~constant and nprobe cells are a fixed byte budget
      val cells = 16 * f
      val (_, tBuild) = time {
        AnnIndex.ivfIndexSave(corpus, "vec_id", "embedding", cells, dir) }
      val stats = AnnIndex.indexStats(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
      val totalBytes = stats.map(_._3).sum
      val cent = AnnIndex.readCentroids(spark, s"$dir/centroids")
      val probed = AnnIndex.probeCells(queries, "vec_id", "embedding", cent, 4)
        .map(_.asInstanceOf[Long]).toSet
      val probedBytes = stats.filter(s => probed.contains(s._1)).map(_._3).sum
      // warm once (codegen/classloading), then 3 timed reps
      AnnIndex.probe(spark, dir, queries, "vec_id", "embedding", 5, 4).count()
      // pruning evidence in the plan: the codes scan must carry the
      // probed-cell set as a PartitionFilter (static pruning — `isin`
      // on a partition column), not a post-scan Filter
      val probePlan = AnnIndex.probe(spark, dir, queries, "vec_id", "embedding", 5, 4)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      probePlan.linesIterator
        .filter(l => l.contains("PartitionFilters") || l.contains("Location"))
        .take(4).foreach(l => println("  " + l.trim.take(200)))
      // PLANNING alone (recovery + meta/centroid reads + probe-cell
      // collect + file-index build + plan), no execution: the r13 ×100
      // run surfaced planning — not scanning — as the component that
      // grew with store size (1.95 → 4.79 s at flat 0.1 MB scanned),
      // which prunedRead fixed; this column is the direct evidence
      val plans = (1 to 3).map { _ =>
        time { AnnIndex.probe(spark, dir, queries, "vec_id", "embedding", 5, 4)
          .queryExecution.executedPlan }._2
      }
      val planMed = plans.sorted.apply(1)
      val runs = (1 to 3).map { _ =>
        val ((_, scanB), t) = time { measuredBytes {
          AnnIndex.probe(spark, dir, queries, "vec_id", "embedding", 5, 4).count() } }
        (t, scanB)
      }
      val med = runs.map(_._1).sorted.apply(1)
      val minT = runs.map(_._1).min
      val scanMed = runs.map(_._2).sorted.apply(1)
      println(f"f=$f%2d  cells=$cells%4d  build=${tBuild}%6.1f s  " +
        f"index=${totalBytes / 1e6}%8.1f MB  probedCells=${probed.size}%3d  " +
        f"probedBytes=${probedBytes / 1e6}%7.1f MB  " +
        f"plan med=${planMed}%5.2f s  " +
        f"probe med=${med}%5.2f s (min ${minT}%5.2f)  scanRead=${scanMed / 1e6}%7.1f MB")
    }
    spark.stop()
  }
}
