package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.expressions.QuantileSketchExpressions
import graft.expressions.QuantileSketchExpressions._

/** One-off measurement: worst rank error of the k=256 KLL sketch on the
  * real lineitem l_extendedprice column per l_returnflag group, at the
  * SF dirs given on the command line. Backs the ε choice in x40b. */
object ProbeKllError {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-kll")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- args) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").cast("double").as("price"))
      val sks = li.groupBy("flag")
        .agg(kll_sketch(col("price"), 256).as("sk"), count(lit(1)).as("n"))
        .collect()
      for (r <- sks) {
        val flag = r.getString(0); val sk = r.getAs[Array[Byte]](1); val n = r.getLong(2)
        val exact = li.filter($"flag" === flag).select("price").as[Double]
          .collect().sorted
        for (q <- Seq(0.25, 0.5, 0.95)) {
          val est = QuantileSketchExpressions.quantileOf(sk, q).asInstanceOf[Double]
          // EXACTLY the quantity the x40b gate checks: count(v <= est)
          // vs q·n (binarySearch picks an arbitrary index inside a
          // duplicate run and would understate the gated error)
          val rank = {
            var lo = 0; var hi = exact.length
            while (lo < hi) { // upper bound: first index with value > est
              val mid = (lo + hi) >>> 1
              if (exact(mid) <= est) lo = mid + 1 else hi = mid
            }
            lo
          }
          val relErr = math.abs(rank - q * n) / n
          println(f"$dir flag=$flag n=$n q=$q relRankErr=$relErr%.5f")
        }
      }
    }
    spark.stop()
  }
}
