package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TensorColumn._

/** N-D tensor column codec (SURVEY §1.4; reference message.py:1036-1038).
  * The oracle-checked fm17 exercises the double path end-to-end; these
  * pin the FloatType convention (mnist.py:27's 28×28 rows), shape
  * guards, and algebraic identities. */
class TensorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mnist-shaped roundtrip: 784 floats reshape to 28x28 and flatten back") {
    val df = Seq((1L, (0 until 784).map(_.toFloat))).toDF("id", "px")
    val row = df.select(reshape2d(col("px"), 28, 28).as("m"), col("px"))
      .select(
        size(col("m")).as("rows"), size(element_at(col("m"), 1)).as("cols"),
        (flatten2d(col("m")) === col("px")).as("ok"),
        element_at(matrixRow(col("m"), 5), 1).as("r5c0")).head()
    assert(row.getInt(0) == 28 && row.getInt(1) == 28)
    assert(row.getBoolean(2))
    assert(row.getFloat(3) == 140.0f) // row 5, col 0 = 5*28
  }

  test("reshape nulls on size mismatch instead of producing a ragged tensor") {
    val df = Seq(Tuple1(Seq(1f, 2f, 3f))).toDF("px")
    assert(df.select(reshape2d(col("px"), 2, 2)).head().isNullAt(0))
    assert(df.select(reshape3d(col("px"), 2, 2, 2)).head().isNullAt(0))
  }

  test("transpose/slice/column identities and 3-D sums") {
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))).toDF("flat")
      .withColumn("m", reshape2d(col("flat"), 2, 3))
    val r = df.select(
      (transpose(transpose(col("m"), 3), 2) === col("m")).as("tt"),
      (matrixColumn(col("m"), 1) === flatten2d(slice2d(col("m"), 0, 2, 1, 1))).as("colslice"),
      sum3d(reshape3d(col("flat"), 3, 1, 2)).as("s3"),
      sum2d(mapElements(col("m"))(x => x * 2)).as("dbl"),
      (shape2d(col("m")) === array(lit(2), lit(3))).as("shp")).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(4))
    assert(r.getDouble(2) == 21.0 && r.getDouble(3) == 42.0)
  }

  test("toTensor2d lifts a flat Frame column into matrix rows") {
    val df = Seq((0L, (0 until 6).map(_.toDouble)), (1L, (6 until 12).map(_.toDouble)))
      .toDF("id", "v")
    val f = graft.frame.Frame.fromDF(df, Seq("id"))
    val out = graft.operators.Pipes.toTensor2d(f, "v", 2, 3)
    val rows = out.df.orderBy("id")
      .select(size(col("v")).as("d0"), element_at(matrixRow(col("v"), 1), 3).as("last"))
      .as[(Int, Float)].collect()
    assert(rows.toSeq == Seq((2, 5.0f), (2, 11.0f)))
  }
}
