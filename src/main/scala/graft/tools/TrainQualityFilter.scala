package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerate [[graft.functions.QualityFilterWeights]] from the
  * training fixture: runs [[graft.functions.QualityFilter
  * .trainDefault]] (the repo Trainer's deterministic SGD) and prints
  * the Scala source of the pinned constants. Provenance for the
  * shipped numbers — CurationSpec re-runs the same training and
  * asserts bit-equality, so the constants cannot drift silently.
  *
  * Run: sbt "runMain graft.tools.TrainQualityFilter" and paste the
  * output over QualityFilterWeights.scala's W/B.
  */
object TrainQualityFilter {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("train-quality-filter")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (w, b) = graft.functions.QualityFilter.trainDefault(spark)
    println("  val W: Array[Long] = Array(")
    println(w.grouped(8).map(g => "    " + g.mkString("L, ") + "L")
      .mkString(",\n") + ")")
    println(s"  val B: Long = ${b}L")
    // convergence report: training accuracy under the micro threshold
    val acc = graft.functions.QualityFilter.TrainingFixture.count { case (t, y) =>
      val x = graft.functions.QualityFilter.featuresOf(t)
      val tot = x.zip(w).map { case (xi, wi) => xi * wi }.sum + b
      (tot > 500000.0) == (y > 0.5)
    }
    println(s"// train accuracy: $acc/${graft.functions.QualityFilter.TrainingFixture.size}")
    spark.stop()
  }
}
