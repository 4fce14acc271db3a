package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot generator for the checked-in bloom-format fixture
  * (src/test/resources/fixtures/ref_content.bloom) that DedupSpec's
  * Spark-upgrade tripwire compares against. Re-run ONLY to bless a new
  * format after an intentional Spark upgrade:
  * `sbt "runMain graft.tools.MakeBloomFixture"`. */
object MakeBloomFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/ref_content.bloom")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ref = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bytes = graft.functions.DedupFunctions.buildContentBloom(
      ref, "text", expectedItems = 100L, fpp = 0.01)
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
    println(s"wrote ${bytes.length} bytes to $p")
    spark.stop()
  }
}
