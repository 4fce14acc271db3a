package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.DedupFunctions._

/** Round-10 variance attribution for d4b: runs the d4b pipeline N reps
  * in one JVM (caches released between reps, exactly like a Bench
  * pass) and prints per-rep wall time alongside the JVM's cumulative
  * GC-time delta for that rep — separating "the query got slower"
  * from "a collector pause landed on this rep".
  *
  * Run: `sbt "runMain graft.tools.ProfileD4bReps /root/testdata/sf0.1 6"`
  */
object ProfileD4bReps {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("6").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import scala.jdk.CollectionConverters._
    def gcMillis: Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum

    // per-stage wall durations (submission → completion), to catch the
    // intermittent 10–25 s reps a GC counter can't explain
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stageLog.add((si.stageId, dur, si.name.takeWhile(_ != '\n').take(80)))
      }
    })

    def onePass(): (Double, Long, Long) = {
      val t0 = System.nanoTime(); val g0 = gcMillis
      val pairs = jaccardPairs(
        documents(spark, d).filter(length(col("text")) >= 5),
        "doc_id", "text", charShingles(_, 5), threshold = 0.4)
      val n = pairs.count()
      pairs.unpersist(blocking = false)
      clearVerifyStatCache()
      ((System.nanoTime() - t0) / 1e9, gcMillis - g0, n)
    }
    (1 to reps).foreach { i =>
      stageLog.clear()
      val (wall, gc, n) = onePass()
      println(f"rep $i%2d  wall ${wall}%6.2f s  gc ${gc / 1000.0}%5.2f s  pairs $n")
      val slow = stageLog.asScala.toSeq.sortBy(-_._2).take(5)
      slow.filter(_._2 >= 500).foreach { case (id, dur, nm) =>
        println(f"     stage $id%4d ${dur / 1000.0}%6.2f s  $nm")
      }
    }
    spark.stop()
  }
}
