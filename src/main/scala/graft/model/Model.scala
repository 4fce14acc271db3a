package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** U1 Model (reference: core/model.py:13-235): a parameterized
  * DataFrame transform. The reference couples a state-`update` hook to
  * every data access; on Spark state updates are an explicit `fit`
  * phase (SURVEY §7.5.4) and `transform` is a pure plan fragment.
  */
trait Model {
  def name: String
  def components: ComponentMap
  def transform(df: DataFrame): DataFrame
}

object Model {
  /** U3 model_from_module (model.py:266-287): adapt an arbitrary
    * DataFrame→DataFrame transform into a (stateless) Model. */
  def fromFunction(fnName: String, fn: DataFrame => DataFrame): Model = new Model {
    val name: String = fnName
    val components: ComponentMap = new ComponentMap
    def transform(df: DataFrame): DataFrame = fn(df)
  }
}

/** Linear model y_pred = Σ m_i·x_i + b (reference: DummyModel /
  * DummyMultilinearModel, utils/test_helpers.py:175-222).
  *
  * `fit` is distributed closed-form least squares: one aggregation
  * computes the exact DECIMAL moment matrix (order-invariant at any
  * cluster size), the tiny (p+1)×(p+1) normal-equation solve happens
  * on the driver. No iteration over the data, no collect of rows.
  */
final class LinearModel(val name: String, val xCols: Seq[String],
                        val yCol: String, val predCol: String,
                        val components: ComponentMap) extends Model {

  def m: Array[Double] = components("m")
  def b: Double = components("b")(0)

  def transform(df: DataFrame): DataFrame = {
    val terms = xCols.zipWithIndex.map { case (c, i) => col(c) * lit(m(i)) }
    df.withColumn(predCol, terms.reduce(_ + _) + lit(b))
  }
}

object LinearModel {

  def apply(name: String, xCols: Seq[String], yCol: String,
            predCol: String = "y_pred"): LinearModel =
    new LinearModel(name, xCols, yCol, predCol,
      ComponentMap.of("m" -> Array.fill(xCols.size)(0.0), "b" -> Array(0.0)))

  /** Exact simple-regression fit (p=1): slope/intercept from decimal
    * sums via the textbook closed form — bit-reproducible (the oracle
    * mirrors the same double ops). */
  def fitSimple(df: DataFrame, xCol: String, yCol: String): (Double, Double) = {
    def dec(c: Column) = c.cast("decimal(18,2)")
    val r = df.agg(
      sum(dec(col(xCol))).cast("double").as("sx"),
      sum(dec(col(yCol))).cast("double").as("sy"),
      sum(dec(col(xCol)) * dec(col(yCol))).cast("double").as("sxy"),
      sum(dec(col(xCol)) * dec(col(xCol))).cast("double").as("sxx"),
      count(lit(1)).cast("double").as("n")).head()
    val (sx, sy, sxy, sxx, n) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    (slope, intercept)
  }

  /** Distributed multi-feature fit: exact decimal moment matrix in one
    * pass, Gaussian-elimination solve on the driver ((p+1)² doubles). */
  def fit(df: DataFrame, xCols: Seq[String], yCol: String,
          name: String = "linear", predCol: String = "y_pred"): LinearModel = {
    def dec(c: Column) = c.cast("decimal(18,2)")
    val feats = xCols.map(c => dec(col(c))) :+ lit(java.math.BigDecimal.ONE).cast("decimal(18,2)")
    val p = feats.size
    val aggs = (for {
      i <- 0 until p; j <- i until p
    } yield sum(feats(i) * feats(j)).cast("double").as(s"xtx_${i}_$j")) ++
      (0 until p).map(i => sum(feats(i) * dec(col(yCol))).cast("double").as(s"xty_$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val xtx = Array.ofDim[Double](p, p)
    for { i <- 0 until p; j <- i until p } {
      val v = row.getAs[Double](s"xtx_${i}_$j"); xtx(i)(j) = v; xtx(j)(i) = v
    }
    val xty = Array.tabulate(p)(i => row.getAs[Double](s"xty_$i"))
    val w = solve(xtx, xty)
    new LinearModel(name, xCols, yCol, predCol,
      ComponentMap.of("m" -> w.take(p - 1), "b" -> Array(w(p - 1))))
  }

  /** In-place Gaussian elimination with partial pivoting. */
  private[graft] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = a.map(_.clone()); val y = b.clone()
    for (k <- 0 until n) {
      val piv = (k until n).maxBy(i => math.abs(m(i)(k)))
      val (tm, ty) = (m(piv), y(piv)); m(piv) = m(k); m(k) = tm
      val t = y(piv); y(piv) = y(k); y(k) = t
      for (i <- k + 1 until n) {
        val f = m(i)(k) / m(k)(k)
        for (j <- k until n) m(i)(j) -= f * m(k)(j)
        y(i) -= f * y(k)
      }
    }
    val x = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var s = y(i)
      for (j <- i + 1 until n) s -= m(i)(j) * x(j)
      x(i) = s / m(i)(i)
    }
    x
  }
}
