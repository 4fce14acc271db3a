package graft.tools
import org.apache.spark.sql.SparkSession
object CheckX18b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    val df = graft.SparkEntry.queries("x18b_winnowing_pairs")(spark, "/root/testdata/sf0.01")
    df.coalesce(1).write.mode("overwrite").parquet("/tmp/x18b_spark")
    println("ROWS=" + spark.read.parquet("/tmp/x18b_spark").count())
    spark.stop()
  }
}
