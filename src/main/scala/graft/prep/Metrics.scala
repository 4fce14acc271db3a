package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3 classification metrics (reference: confusion-matrix counts
  * accumulated batch-wise then finalized, examples/mnist.py:164-219).
  * On Spark the accumulation is one hash aggregation; the finalization
  * is arithmetic over the tiny counts table.
  */
object Metrics {

  /** Confusion counts: one row per (label, prediction). */
  def confusion(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.groupBy(col(labelCol).as("label"), col(predCol).as("prediction"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision/recall/F1 from raw predictions. All ratios are
    * int-count divisions — deterministic doubles. */
  def classificationReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cm = confusion(df, labelCol, predCol).cache()
    val tp = cm.filter(col("label") === col("prediction"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val byLabel = cm.groupBy(col("label").as("cls")).agg(sum("n").as("support"))
    val byPred = cm.groupBy(col("prediction").as("cls")).agg(sum("n").as("predicted"))
    byLabel
      .join(byPred, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .na.fill(0L, Seq("tp", "support", "predicted"))
      .withColumn("precision",
        when(col("predicted") > 0, col("tp").cast("double") / col("predicted").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("support") > 0, col("tp").cast("double") / col("support").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(lit(0.0)))
  }
}
