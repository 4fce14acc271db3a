package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-stage cpu/task breakdown of one s16 (ivfKnnJoin) run — the
  * optimization-round attribution tool for the batch-join parallelism
  * change: wall halved but bench cpu medians moved, so this prints
  * stage-level executorCpuTime / task counts / shuffle bytes for the
  * exact query shape, on a fresh session, one run per invocation.
  *
  * Run: sbt "runMain graft.tools.ProfileS16Cpu /root/testdata/sf0.1 3"
  */
object ProfileS16Cpu {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(var cpuNs: Long = 0L, var tasks: Int = 0,
                  var shufRead: Long = 0L, var shufWrite: Long = 0L,
                  var name: String = "")
    val stages = mutable.LinkedHashMap[Int, St]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stages.getOrElseUpdate(e.stageInfo.stageId, St()).name = e.stageInfo.name.take(60)
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val s = stages.getOrElseUpdate(te.stageId, St())
          s.cpuNs += m.executorCpuTime; s.tasks += 1
          s.shufRead += m.shuffleReadMetrics.totalBytesRead
          s.shufWrite += m.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    (1 to reps).foreach { r =>
      stages.clear()
      val t0 = System.nanoTime()
      val n = graft.functions.SimilarityFunctions
        .ivfKnnJoin(e, e, "vec_id", "embedding", k = 3, centroids = 16, nprobe = 2)
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener bus
      val lb = spark.sparkContext.getClass.getMethod("listenerBus").invoke(spark.sparkContext)
      lb.getClass.getMethod("waitUntilEmpty").invoke(lb)
      val totCpu = stages.values.map(_.cpuNs).sum / 1e9
      println(f"rep $r: rows=$n wall=$wall%.2f cpu=$totCpu%.2f")
      stages.toSeq.sortBy(-_._2.cpuNs).take(8).foreach { case (id, s) =>
        println(f"  stage $id%4d cpu=${s.cpuNs / 1e9}%7.2f tasks=${s.tasks}%4d shufR=${s.shufRead / 1048576.0}%7.1fMB shufW=${s.shufWrite / 1048576.0}%7.1fMB ${s.name}")
      }
    }
    spark.stop()
  }
}
