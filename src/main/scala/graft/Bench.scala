package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Each query runs SPARK_GRAFT_REPS (default 3) full passes and
  * reports the per-query MEDIAN ("value" = sum of medians), so
  * environmental one-offs (GC pauses, page-cache misses) stop
  * masquerading as regressions; "spread" carries per-query max−min for
  * the honesty trail. SPARK_GRAFT_WARMUP (default 1) UNCOUNTED full
  * passes run first: the first pass of a cold JVM carries codegen
  * compilation, classloading and page-cache fill for every query —
  * with only 3 counted reps that cost lands in half the medians and
  * round-over-round deltas drown in it (round-6 recorded a 19.9 s
  * d4b spread; two clean builder runs of the same build differed by
  * 20 s on the same queries). Memoized intermediates are released
  * BETWEEN passes — every pass pays its own materialization
  * (intra-pass sharing between queries is unchanged from the
  * single-pass bench), so the median measures the query, not a warm
  * cache. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen once on the tiny SF so per-query numbers
    // measure the plan, not first-call classloading.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    def runPass(): Map[String, Double] = {
      val pass = queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
      SparkEntry.releaseCaches() // next pass pays its own materialization
      pass.toMap
    }
    (1 to warmup).foreach(_ => runPass()) // uncounted: absorbs cold-JVM cost
    val passes = (1 to reps).map(_ => runPass())
    val results = queries.map { case (name, _) =>
      val ts = passes.map(_(name)).sorted
      (name, ts(ts.size / 2), ts.last - ts.head)
    }
    val qs = results.map { case (k, med, _) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    val sp = results.map { case (k, _, s) => "\"" + k + "\":" + f"$s%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalS = f"$total%.3f"
    val fullJson = s"""{"metric":"total","value":$totalS,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"warmup":$warmup,"spread":$sp}"""
    // Full per-query JSON: printed first AND written to a fixed path —
    // the single ~4 KB line outruns the driver's stdout tail capture
    // (BENCH_r01–r03 all recorded "parsed": null), so the durable copy
    // lives on disk and the LAST stdout line is a compact summary that
    // always fits a tail buffer.
    println(fullJson)
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_full.json"))
    java.nio.file.Files.write(fullPath,
      (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val top = results.sortBy(-_._2).take(5)
      .map { case (k, med, _) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$totalS,"unit":"sec","sf":"$sfDir","reps":$reps,"warmup":$warmup,"n":${results.size},"top":$top,"full":"$fullPath"}""")
    SparkEntry.releaseCaches()
    spark.stop()
  }
}
