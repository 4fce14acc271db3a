package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 probe: does the dedup verify stage build its broadcast
  * hashed-set relation once (ReusedExchange on the second attach) or
  * twice? Prints the post-execution adaptive plan of containmentPairs'
  * result at sf0.01. */
object PlanCheckR10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
    val p = graft.functions.DedupFunctions.containmentPairs(
      docs, "doc_id", "text", 3, 0.7)
    val plan = p.queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastExchange".r.findAllIn(plan).size
    val nReused = "ReusedExchange".r.findAllIn(plan).size
    println(s"BroadcastExchange=$nBroadcast ReusedExchange=$nReused")
    println(plan)
    p.unpersist()
    spark.stop()
  }
}
