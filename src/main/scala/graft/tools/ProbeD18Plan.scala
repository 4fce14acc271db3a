package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan probe for the d18b candidate join at sf0.1: prints the
  * executed plan and stage task counts to attribute the ×100 profile
  * wall (suspect: AQE coalescing the small pref-relation shuffle to
  * ~1 partition, serializing the explosive candidate join).
  *
  * Run: sbt "runMain graft.tools.ProbeD18Plan /root/testdata/sf0.1"
  */
object ProbeD18Plan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cust = spark.read.parquet(s"$d/customer.parquet")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val df = graft.functions.DedupFunctions
      .fuzzyPairs(cust, "c_name", maxDist = 1, q = 2, prefixFilter = true)
    val (n, t) = time(df.count())
    println(f"pairs=$n wall=$t%.2f s")
    println(df.queryExecution.executedPlan.toString.take(9000))
    spark.stop()
  }
}
