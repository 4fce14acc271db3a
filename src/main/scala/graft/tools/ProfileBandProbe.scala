package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import graft.Tables._
import graft.functions.BandIndex

/** Measures the persisted BAND-index probe LAW for SCALE.md — the d16
  * analogue of [[ProfileAnnProbe]]: build the index over ×f corpus
  * replicas (the ProfileScale alphabet-rotation synthesis), hold the
  * probe batch constant, and show probe cost follows the BATCH's band
  * keys × per-bucket bytes, not index size. The production dial is
  * `prefixLen`: 16^prefixLen buckets, so scaling prefixLen with the
  * corpus holds per-bucket bytes ~constant — corpus ×16 with
  * prefixLen+1 keeps the probed byte budget flat while the probed
  * FRACTION of the store falls 16×. Pruning evidence: per-probe
  * task-level `inputMetrics.bytesRead` next to the store's total
  * bytes, plus the probed-bucket count against 16^prefixLen.
  *
  * Usage: runMain graft.tools.ProfileBandProbe [sfDir] [series] [batchDocs]
  * where series = comma list of factor:prefixLen (default "1:2,16:3")
  * and batchDocs sizes the probe batch (default 5 — the flat-law
  * fixture; pass the full base size to stress the driver-side
  * prefix-match with ~16^prefixLen distinct base buckets, the r15
  * finding-#2 regime the 5-doc batch cannot reach).
  */
object ProfileBandProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val series = args.lift(1).getOrElse("1:2,16:3").split(",").map { s =>
      val Array(f, pl) = s.trim.split(":"); (f.toInt, pl.toInt)
    }.toSeq
    val batchDocs = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft_bandprobe")
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def measuredBytes[T](f: => T): (T, Long) = {
      Thread.sleep(300); bytesRead.set(0L)
      val r = f
      Thread.sleep(500)
      (r, bytesRead.get())
    }

    val base = documents(spark, d).select("doc_id", "text")
    val baseN = base.count()
    // constant probe batch: 16 bands × batchDocs band keys — the
    // per-batch budget the law says probe cost follows
    val batch = base.filter(col("doc_id") < batchDocs)
      .select((col("doc_id") + 90000000L).as("doc_id"), col("text")).persist()
    batch.count()
    println(s"base corpus: $baseN docs ($d); constant $batchDocs-doc probe batch, 64 hashes / 16 bands")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    // seeded full PERMUTATION per replica (the ProfileScale lesson):
    // rotations repeat with period 26, so a ×100 corpus would hold ~4
    // verbatim copies of every batch doc and the probe law would
    // measure synthesized duplicate density, not the store
    def perm(s: String, seed: Int): String = {
      val r = new scala.util.Random(seed)
      r.shuffle(s.toList).mkString
    }

    for ((f, pl) <- series) {
      val p = s"$tmp/docs_x$f"
      (0 until f).map { c =>
        if (c == 0) base
        else base.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper + digits,
            perm(lower, 3 * c + 1) + perm(upper, 3 * c + 2) +
              perm(digits, 3 * c + 3)).as("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
      val corpus = spark.read.parquet(p)
      val dir = s"$tmp/bandidx_x${f}_pl$pl"
      val (_, tBuild) = time {
        BandIndex.save(corpus, "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = 16, dir = dir, prefixLen = pl)
      }
      val stats = BandIndex.stats(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(3))).toMap
      val totalBytes = stats.values.sum
      // warm once, then 3 timed reps; probed buckets from the store's
      // own stats ∩ the batch's band-key prefixes (re-derived with the
      // same public kernels the index uses)
      import graft.functions.DedupFunctions.{wordShingles, bandKeys}
      val probedBuckets = batch
        .select(explode(bandKeys(
          graft.expressions.HashExpressions.minhash_signature(
            wordShingles(col("text"), 3), 64, "md5"), 16, 4)).as("band"))
        .select(substring(col("band"), 1, pl)).distinct()
        .collect().map(_.getString(0)).toSet
      println(s"  batch base buckets at pl=$pl: ${probedBuckets.size} " +
        s"(driver prefix-match work: ${probedBuckets.size}L lookups vs " +
        s"dirs x buckets = ${stats.size}L x ${probedBuckets.size}L compares pre-r16)")
      val probedBytes = stats.filter { case (b, _) => probedBuckets(b) }.values.sum
      BandIndex.probe(spark, dir, batch, "doc_id", "text", 0.8).unpersist(blocking = false)
      // probe is eager (localCheckpoint), so planning can't be timed
      // plan-only on the full pipeline; instead time the component the
      // ANN ×100 run showed growing — the pruned postings read's plan
      // (recovery + listing + file index + plan), no execution
      val plans = (1 to 3).map { _ =>
        time {
          graft.functions.PartitionedStore.prunedRead(spark, s"$dir/bands",
            "bucket", probedBuckets.toSeq).queryExecution.executedPlan
        }._2
      }
      val planMed = plans.sorted.apply(1)
      val runs = (1 to 3).map { _ =>
        val ((pairs, scanB), t) = time { measuredBytes {
          val v = BandIndex.probe(spark, dir, batch, "doc_id", "text", 0.8)
          val n = v.count(); v.unpersist(blocking = false); n
        } }
        (t, scanB, pairs)
      }
      val med = runs.map(_._1).sorted.apply(1)
      val minT = runs.map(_._1).min
      val scanMed = runs.map(_._2).sorted.apply(1)
      println(f"f=$f%3d pl=$pl  buckets=${math.pow(16, pl).toLong}%5d  " +
        f"build=${tBuild}%6.1f s  index=${totalBytes / 1e6}%8.1f MB  " +
        f"probedBuckets=${probedBuckets.size}%4d  probedBytes=${probedBytes / 1e6}%7.2f MB  " +
        f"plan med=${planMed}%5.2f s  " +
        f"probe med=${med}%5.2f s (min ${minT}%5.2f)  scanRead=${scanMed / 1e6}%7.2f MB  " +
        f"pairs=${runs.head._3}%d")
    }
    spark.stop()
  }
}
