package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-9 probe: does x23's corpus-sized doc-length (`dl`) relation
  * cross an exchange, or does AQE already broadcast the postings side
  * into it? Drives the POST-execution adaptive plan at sf0.1. */
object PlanCheckR9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("x23_bm25")(spark, "/root/testdata/sf0.1")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
