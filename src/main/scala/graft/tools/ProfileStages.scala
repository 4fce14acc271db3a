package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Top stages by executor CPU for ONE declared query — the per-task-
  * work attribution tool (guide §1.2 step 2): once a query's plan
  * shape is right, this says which stage's kernel burns the CPU that
  * bounds the low-core-count bench.
  *
  * Run: sbt "runMain graft.tools.ProfileStages /root/testdata/sf0.1 x23_bm25 3"
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = args.lift(1).getOrElse("x23_bm25")
    val reps = args.lift(2).getOrElse("3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(var cpuNs: Long = 0L, var tasks: Int = 0,
                  var inRows: Long = 0L, var outRows: Long = 0L,
                  var shufRead: Long = 0L, var shufWrite: Long = 0L)
    val stages = mutable.LinkedHashMap[Int, St]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val s = stages.getOrElseUpdate(te.stageId, St())
          s.cpuNs += m.executorCpuTime; s.tasks += 1
          s.inRows += m.inputMetrics.recordsRead
          s.outRows += m.shuffleWriteMetrics.recordsWritten
          s.shufRead += m.shuffleReadMetrics.totalBytesRead
          s.shufWrite += m.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    val fn = graft.SparkEntry.queries(qname)
    (1 to reps).foreach { r =>
      stages.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val lb = spark.sparkContext.getClass.getMethod("listenerBus").invoke(spark.sparkContext)
      lb.getClass.getMethod("waitUntilEmpty").invoke(lb)
      val totCpu = stages.values.map(_.cpuNs).sum / 1e9
      println(f"rep $r: rows=$n wall=$wall%.2f cpu=$totCpu%.2f nstages=${stages.size}")
      stages.toSeq.sortBy(-_._2.cpuNs).take(6).foreach { case (id, s) =>
        println(f"  stage $id%4d cpu=${s.cpuNs / 1e9}%7.2f tasks=${s.tasks}%4d inRows=${s.inRows}%9d shufOutRows=${s.outRows}%9d shufR=${s.shufRead / 1048576.0}%7.1fMB shufW=${s.shufWrite / 1048576.0}%7.1fMB")
      }
      graft.SparkEntry.releaseCaches()
    }
    spark.stop()
  }
}
