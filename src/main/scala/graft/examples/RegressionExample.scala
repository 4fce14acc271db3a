package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.frame.Frame
import graft.model.Scaffold
import graft.operators.Pipes
import graft.prep.{Normalizer, Preprocessing}
import graft.explain.Explain

/** End-to-end workflow mirroring the reference's nonlinear-regression
  * example (reference: examples/nonlinear_regression.py +
  * examples/database_example.py pipeline shape):
  *
  *   synthetic y = a + b·x + c·x² data → Frame(_idx) → train/test
  *   split → shuffle → normalize → polynomial least-squares fit →
  *   test-set evaluation → occlusion attribution → Scaffold save.
  *
  * Run: sbt "runMain graft.examples.RegressionExample"
  */
object RegressionExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-regression-example")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic polynomial data (reference generates y = a + b·x + c·x²)
    val (a, b, c) = (5.0, -1.5, 0.25)
    val rng = new scala.util.Random(42)
    val data = (0 until 1000).map { i =>
      val x = math.round((rng.nextDouble() * 100.0 - 50.0) * 100.0) / 100.0
      val y = math.round((a + b * x + c * x * x + rng.nextGaussian()) * 100.0) / 100.0
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
      .withColumn("x2", (col("x") * col("x")).cast("double"))

    val f = Frame.fromDF(data, Seq("id"))
    val (train, test) = Preprocessing.splitByMod(f, "id", 5, 0)
    val shuffled = Pipes.shuffle(train, seed = 7L)

    // fit on the (shuffled) training view — exact distributed LSQ
    val model = graft.model.LinearModel.fit(
      shuffled.df, Seq("x", "x2"), "y", name = "poly")
    println(f"fitted: b=${model.m(0)}%.3f c=${model.m(1)}%.3f a=${model.b}%.3f " +
      f"(true: $b%.3f $c%.3f $a%.3f)")

    // test-set RMSE
    val pred = model.transform(test.df)
    val rmse = math.sqrt(pred
      .select(avg(pow(col("y_pred") - col("y"), 2.0))).head().getDouble(0))
    println(f"test rmse=$rmse%.4f over ${test.length} rows")

    // occlusion attribution: which term drives each prediction?
    val xMean = train.df.agg(avg("x"), avg("x2")).head()
    val attributed = Explain.occlusion1(model.transform, test.df.limit(5),
      Seq("id"), Seq("x", "x2"),
      Map("x" -> xMean.getDouble(0), "x2" -> xMean.getDouble(1)), "y_pred")
    attributed.select("id", "x", "y", "y_pred", "occl_x", "occl_x2")
      .orderBy("id").show(5)

    // snapshot the whole pipeline state
    val dir = java.nio.file.Files.createTempDirectory("graft_example").toString
    new Scaffold().attach(model).save(dir)
    println(s"pipeline state saved to $dir")

    require(math.abs(model.m(0) - b) < 0.6 && math.abs(model.m(1) - c) < 0.6,
      "fit did not converge to generating params")
    spark.stop()
  }
}
