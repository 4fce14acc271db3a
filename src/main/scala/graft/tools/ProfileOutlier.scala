package graft.tools

import org.apache.spark.sql.SparkSession

/** Query-parameterized outlier sandwich (r16 judge finding #1 asked
  * for exactly this generalization of [[ProfileX18Sandwich]]): when a
  * round-close artifact books ONE sample far outside a query's
  * same-code band (x18b 10.62 s vs 0.57–1.96 in r15, q19_json 4.71 s
  * vs 0.22–0.51 in r16), attribution costs one command instead of a
  * bespoke tool.
  *
  * For the named query it reproduces every sample shape Bench emits,
  * under the Bench session config and cpu listener:
  *
  *  A `in-pass`     releaseCaches → declared benchPrereqs run COUNTED
  *                  on their own clocks → query (timed) — the pass
  *                  shape (prereqs sorted before it alphabetically)
  *  B `solo-warmed` releaseCaches → prereqs warmed UNCOUNTED → query
  *                  (timed) — Bench's adaptive top-up / focus shape
  *  C `solo-cold`   releaseCaches → query (timed) — what a sample
  *                  pays if the prereq warm is ineffective
  *
  * For a query with no declared prereqs the three shapes coincide and
  * collapse to one timed arm per rep (labelled `solo`). Cache-storage
  * status is printed before every timed run so "was the shared input
  * cached" is recorded, not assumed. The verdict reads off the table:
  * all arms inside the ambient band with flat cpu → the artifact
  * sample was machine interference; an arm reproducing the outlier
  * with cpu scaled the same way → a real run-shape cost, chase it.
  *
  * Run: sbt "runMain graft.tools.ProfileOutlier <queryId> [sfDir] [reps]"
  *   e.g. sbt "runMain graft.tools.ProfileOutlier q19_json /root/testdata/sf0.1 9"
  */
object ProfileOutlier {
  def main(args: Array[String]): Unit = {
    val queryId = args.headOption.getOrElse(
      sys.error("usage: ProfileOutlier <queryId> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(7)
    val fn = graft.SparkEntry.queries.getOrElse(queryId,
      sys.error(s"unknown query '$queryId' — keys: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val prereqs = graft.SparkEntry.benchPrereqs.getOrElse(queryId, Nil)
      .map(p => p -> graft.SparkEntry.queries(p))

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName(s"profile-outlier-$queryId")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    val listenerBus = spark.sparkContext.getClass
      .getMethod("listenerBus").invoke(spark.sparkContext)
    val waitEmpty = listenerBus.getClass.getMethod("waitUntilEmpty")
    def cpuNow(): Long = { waitEmpty.invoke(listenerBus); cpuNs.get() }

    def storage(): String = {
      val infos = spark.sparkContext.getRDDStorageInfo
      if (infos.isEmpty) "no cached RDDs"
      else infos.map(i => s"${i.name.take(40)} ${i.numCachedPartitions}/${i.numPartitions}p " +
        f"mem=${i.memSize / 1048576.0}%.0fMB disk=${i.diskSize / 1048576.0}%.0fMB").mkString("; ")
    }

    def timed(label: String)(f: => Unit): (Double, Double) = {
      val c0 = cpuNow(); val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNow() - c0) / 1e9
      println(f"  $label%-14s wall $wall%6.2f s  cpu $cpu%7.2f s")
      (wall, cpu)
    }

    // uncounted JVM/codegen warm of prereqs + query
    prereqs.foreach { case (_, p) => p(spark, sfDir).count() }
    fn(spark, sfDir).count()
    graft.SparkEntry.releaseCaches()

    val res = scala.collection.mutable.Map[String, Vector[(Double, Double)]]()
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps) {
      println(s"== rep $rep ==")
      if (prereqs.isEmpty) {
        graft.SparkEntry.releaseCaches()
        println(s"  [storage] ${storage()}")
        res("solo") :+= timed("solo")(fn(spark, sfDir).count())
      } else {
        // A: in-pass shape — prereqs counted on their own clocks first
        graft.SparkEntry.releaseCaches()
        prereqs.foreach { case (pn, p) =>
          res(s"A_$pn") :+= timed(s"A $pn")(p(spark, sfDir).count()) }
        println(s"  [storage before A] ${storage()}")
        res("A_query") :+= timed("A query")(fn(spark, sfDir).count())
        // B: Bench solo top-up shape (prereqs warmed uncounted)
        graft.SparkEntry.releaseCaches()
        prereqs.foreach { case (_, p) => p(spark, sfDir).count() }
        println(s"  [storage before B] ${storage()}")
        res("B_query") :+= timed("B query")(fn(spark, sfDir).count())
        // C: prereq warm ineffective — shared inputs pay on this clock
        graft.SparkEntry.releaseCaches()
        println(s"  [storage before C] ${storage()}")
        res("C_query") :+= timed("C query")(fn(spark, sfDir).count())
      }
    }
    println("\narm,med_wall,med_cpu,min_wall,max_wall")
    res.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val w = v.map(_._1).sorted; val c = v.map(_._2).sorted
      println(f"$k%-10s ${w(w.size / 2)}%6.2f ${c(c.size / 2)}%8.2f ${w.head}%6.2f ${w.last}%6.2f")
    }
    spark.stop()
  }
}
