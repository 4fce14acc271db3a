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

  /** Freeze/unfreeze components against fit updates (model.py:424-452:
    * `requires_grad=False` on the named components; no args = all).
    * Frozen components still participate in `transform` and in the
    * gradient/residual math — they just stop receiving updates, which
    * is the transfer-learning partial-fit contract. */
  def freeze(componentNames: String*): Unit = components.freeze(componentNames)
  def unfreeze(componentNames: String*): Unit = components.unfreeze(componentNames)
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
  * computes a DECIMAL(precision, scale) moment matrix (order-invariant
  * at any cluster size), the tiny (p+1)×(p+1) normal-equation solve
  * happens on the driver. No iteration over the data, no collect of
  * rows. NOTE the quantization: inputs are rounded to `scale`
  * fractional decimal digits before the moment sums, so the fit is
  * exact only for data with at most that many decimal places (default
  * scale=2 fits TPC-H-style monetary data); pass a larger scale for
  * finer-grained features, keeping 2·precision <= 38 so squared terms
  * stay representable. Cast overflow fails loudly instead of silently
  * dropping rows from the sums.
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

  /** Overflow sentinels for one fit pass: count(raw) vs count(cast) per
    * column, evaluated inside the same aggregation as the moment sums
    * (no extra scan). */
  private def overflowAggs(cols: Seq[String], decType: String): Seq[Column] =
    cols.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      count(col(c).cast(decType)).as(s"__nd_$c")))

  private def assertNoOverflow(row: org.apache.spark.sql.Row, cols: Seq[String],
                               decType: String): Unit =
    cols.foreach { c =>
      val n = row.getAs[Long](s"__n_$c"); val nd = row.getAs[Long](s"__nd_$c")
      if (nd != n) throw new ArithmeticException(
        s"LinearModel.fit: ${n - nd} value(s) of '$c' overflow $decType; raise `precision` " +
          "(values would otherwise be silently dropped from the moment sums)")
    }

  /** Simple-regression fit (p=1): slope/intercept from decimal sums via
    * the textbook closed form — bit-reproducible (the oracle mirrors
    * the same double ops); exact for <= `scale`-decimal-digit data (see
    * class note). */
  def fitSimple(df0: DataFrame, xCol: String, yCol: String,
                precision: Int = 18, scale: Int = 2): (Double, Double) = {
    require(2 * precision <= 38,
      s"fitSimple: 2*precision must be <= 38 so product terms stay in decimal range, got $precision")
    val decType = s"decimal($precision,$scale)"
    def dec(c: Column) = c.cast(decType)
    // complete-case rows only: a null in EITHER column must remove the
    // whole row from every moment, or count(lit(1)) disagrees with the
    // null-skipping sums and the closed form silently mixes populations
    val df = df0.na.drop(Seq(xCol, yCol).distinct)
    val aggs = Seq(
      sum(dec(col(xCol))).cast("double").as("sx"),
      sum(dec(col(yCol))).cast("double").as("sy"),
      sum(dec(col(xCol)) * dec(col(yCol))).cast("double").as("sxy"),
      sum(dec(col(xCol)) * dec(col(xCol))).cast("double").as("sxx"),
      count(lit(1)).cast("double").as("n")) ++ overflowAggs(Seq(xCol, yCol).distinct, decType)
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    assertNoOverflow(r, Seq(xCol, yCol).distinct, decType)
    val (sx, sy, sxy, sxx, n) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    (slope, intercept)
  }

  /** One-pass decimal moment matrix: (XᵀX, Xᵀy) over the features plus
    * a trailing intercept column; the only cluster work in a fit. */
  private def moments(df0: DataFrame, xCols: Seq[String], yCol: String,
                      precision: Int, scale: Int): (Array[Array[Double]], Array[Double]) = {
    require(2 * precision <= 38,
      s"fit: 2*precision must be <= 38 so product terms stay in decimal range, got $precision")
    val decType = s"decimal($precision,$scale)"
    def dec(c: Column) = c.cast(decType)
    // complete-case rows only (see fitSimple): the intercept moment
    // (lit(1)) counts every row, so a null feature/label row would
    // otherwise enter XᵀX's intercept cell but none of the sums
    val df = df0.na.drop((xCols :+ yCol).distinct)
    val feats = xCols.map(c => dec(col(c))) :+ lit(java.math.BigDecimal.ONE).cast(decType)
    val p = feats.size
    val aggs = (for {
      i <- 0 until p; j <- i until p
    } yield sum(feats(i) * feats(j)).cast("double").as(s"xtx_${i}_$j")) ++
      (0 until p).map(i => sum(feats(i) * dec(col(yCol))).cast("double").as(s"xty_$i")) ++
      overflowAggs((xCols :+ yCol).distinct, decType)
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    assertNoOverflow(row, (xCols :+ yCol).distinct, decType)
    val xtx = Array.ofDim[Double](p, p)
    for { i <- 0 until p; j <- i until p } {
      val v = row.getAs[Double](s"xtx_${i}_$j"); xtx(i)(j) = v; xtx(j)(i) = v
    }
    val xty = Array.tabulate(p)(i => row.getAs[Double](s"xty_$i"))
    (xtx, xty)
  }

  /** Distributed multi-feature fit: decimal moment matrix in one pass,
    * Gaussian-elimination solve on the driver ((p+1)² doubles); exact
    * for <= `scale`-decimal-digit data (see class note). */
  def fit(df: DataFrame, xCols: Seq[String], yCol: String,
          name: String = "linear", predCol: String = "y_pred",
          precision: Int = 18, scale: Int = 2): LinearModel = {
    val (xtx, xty) = moments(df, xCols, yCol, precision, scale)
    val p = xty.length
    val w = solve(xtx, xty)
    new LinearModel(name, xCols, yCol, predCol,
      ComponentMap.of("m" -> w.take(p - 1), "b" -> Array(w(p - 1))))
  }

  /** Partial refit honoring frozen components (model.py:424-452): the
    * frozen parameters keep their current values and the FREE ones are
    * solved exactly, conditioned on them — the reduced normal
    * equations `A[F,F]·w_F = (Xᵀy)[F] − A[F,Z]·w_Z` (F = free indices,
    * Z = frozen; the frozen contribution moves to the right-hand side
    * as a residual). One aggregation pass either way; results are
    * written back through the model's ComponentMap so shared
    * parameters propagate. With nothing frozen this equals `fit`. */
  def fitFrom(df: DataFrame, model: LinearModel,
              precision: Int = 18, scale: Int = 2): LinearModel = {
    val p = model.xCols.size + 1 // trailing intercept index
    val frozen: Set[Int] =
      (if (model.components.isFrozen("m")) (0 until p - 1).toSet else Set.empty[Int]) ++
        (if (model.components.isFrozen("b")) Set(p - 1) else Set.empty[Int])
    if (frozen.size == p) return model // everything frozen: no-op
    val (xtx, xty) = moments(df, model.xCols, model.yCol, precision, scale)
    val cur = model.m :+ model.b
    val free = (0 until p).filterNot(frozen).toArray
    val a = Array.tabulate(free.length, free.length)((i, j) => xtx(free(i))(free(j)))
    val rhs = Array.tabulate(free.length) { i =>
      xty(free(i)) - frozen.toSeq.sorted.map(z => xtx(free(i))(z) * cur(z)).sum
    }
    val wf = solve(a, rhs)
    val next = cur.clone()
    free.zipWithIndex.foreach { case (idx, i) => next(idx) = wf(i) }
    model.components("m") = next.take(p - 1)
    model.components("b") = Array(next(p - 1))
    model
  }

  /** In-place Gaussian elimination with partial pivoting. Throws on a
    * singular system (collinear / duplicated / constant features)
    * instead of letting 0/0 propagate NaN weights silently. */
  private[graft] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = a.map(_.clone()); val y = b.clone()
    val tol = 1e-12 * math.max(1.0, a.map(_.map(math.abs).max).max)
    for (k <- 0 until n) {
      val piv = (k until n).maxBy(i => math.abs(m(i)(k)))
      if (math.abs(m(piv)(k)) <= tol)
        throw new IllegalArgumentException(
          "LinearModel: singular normal equations (collinear, duplicated or " +
            s"constant feature at column $k) — weights would be NaN")
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
