package graft.tools

import org.apache.spark.sql.SparkSession

/** r15 finding #1: the round-close artifact booked x18b_winnowing_pairs
  * at 10.62 s (6 samples, min 1.44, cpu-median 88 s) while four
  * same-code runs read 0.57–1.96 s. The cpu median says the slow
  * samples did ~15× the WORK — not ambient wait — so the suspect is
  * the shared winnowFpsShared persist not being consumed in some
  * sample shape. This sandwich times x18b in every shape Bench
  * produces, with the Bench session config and cpu listener:
  *
  *  A `paired`      releaseCaches → x18 (timed) → x18b (timed)
  *                  — the in-pass shape (x18 sorts immediately before)
  *  B `solo-warmed` releaseCaches → warm x18 uncounted → x18b (timed)
  *                  — Bench's adaptive top-up shape (solo() + prereq)
  *  C `solo-cold`   releaseCaches → x18b (timed)
  *                  — what a sample pays if the prereq warm is
  *                  ineffective: fps materializes on x18b's clock,
  *                  and every extra reference recomputes the
  *                  char-explode chain
  *
  * Storage status for the fps persist is printed before each timed
  * x18b so "was it cached" is recorded, not assumed.
  *
  * Run: sbt "runMain graft.tools.ProfileX18Sandwich /root/testdata/sf0.1 5"
  * Results: BENCH.md round-16 attribution.
  */
object ProfileX18Sandwich {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-x18-sandwich")
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

    val x18 = graft.SparkEntry.queries("x18_winnowing")
    val x18b = graft.SparkEntry.queries("x18b_winnowing_pairs")

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

    // uncounted JVM/codegen warm
    x18(spark, sfDir).count(); x18b(spark, sfDir).count()
    graft.SparkEntry.releaseCaches()

    val res = scala.collection.mutable.Map[String, Vector[(Double, Double)]]()
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps) {
      println(s"== rep $rep ==")
      // A: in-pass shape
      graft.SparkEntry.releaseCaches()
      val a18 = timed("A x18")   { x18(spark, sfDir).count() }
      println(s"  [storage before A x18b] ${storage()}")
      val a = timed("A x18b")    { x18b(spark, sfDir).count() }
      res("A_x18") :+= a18; res("A_x18b") :+= a
      // B: Bench solo top-up shape (prereq warmed uncounted)
      graft.SparkEntry.releaseCaches()
      x18(spark, sfDir).count()
      println(s"  [storage before B x18b] ${storage()}")
      val b = timed("B x18b")    { x18b(spark, sfDir).count() }
      res("B_x18b") :+= b
      // C: prereq warm ineffective — fps pays on x18b's clock
      graft.SparkEntry.releaseCaches()
      println(s"  [storage before C x18b] ${storage()}")
      val c = timed("C x18b")    { x18b(spark, sfDir).count() }
      res("C_x18b") :+= c
    }
    println("\nphase,med_wall,med_cpu,min_wall,max_wall  (sorted by wall)")
    res.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val w = v.map(_._1).sorted; val c = v.map(_._2).sorted
      println(f"$k%-8s ${w(w.size / 2)}%6.2f ${c(c.size / 2)}%8.2f ${w.head}%6.2f ${w.last}%6.2f")
    }
    spark.stop()
  }
}
