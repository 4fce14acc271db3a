package graft.explain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model attribution (reference: extensions/explain.py).
  *
  * U13 Occlusion-1 (explain.py:133-178): attribution of feature i for a
  * row = model(x) - model(x with x_i replaced by a baseline). Pure
  * forward passes, fully distributed.
  *
  * U11 GradientxInput (explain.py:10-46) and U12 IntegratedGradients
  * (explain.py:48-112) use torch autograd in the reference; here the
  * gradient is a central finite difference of the model's own forward
  * plan — every probe is a column-expression transform of the SAME
  * DataFrame, so the whole attribution runs distributed with no autograd
  * and no driver loop over rows. Exact for (piecewise-)linear models up
  * to fp rounding; O(2·p) forward passes per probe point.
  */
object Explain {

  /** Returns the modeled frame plus one `occl_<col>` attribution column
    * per feature. `model` must add `predCol`; `baselines` supplies the
    * occlusion value per feature (commonly the column mean); `idCols`
    * identify rows across the p+1 applications (all p joins hash on the
    * same key, so after the first shuffle the rest co-partition). */
  def occlusion1(model: DataFrame => DataFrame, df: DataFrame,
                 idCols: Seq[String], xCols: Seq[String],
                 baselines: Map[String, Double], predCol: String): DataFrame = {
    val base = model(df)
    xCols.foldLeft(base) { (acc, c) =>
      val occ = model(df.withColumn(c, lit(baselines(c))))
        .select((idCols.map(col) :+ col(predCol).as(s"__occ_$c")): _*)
      acc.join(occ, idCols)
        .withColumn(s"occl_$c", col(predCol) - col(s"__occ_$c"))
        .drop(s"__occ_$c")
    }
  }

  /** Per-row numeric gradient dY/dx_c at the row's own x: central
    * difference over two shifted forward passes, joined on row
    * identity (same-key joins co-partition after the first shuffle). */
  private def numericGradients(model: DataFrame => DataFrame, df: DataFrame,
                               idCols: Seq[String], xCols: Seq[String],
                               predCol: String, eps: Double): DataFrame =
    xCols.foldLeft(df) { (acc, c) =>
      val up = model(df.withColumn(c, col(c) + lit(eps)))
        .select((idCols.map(col) :+ col(predCol).as("__up")): _*)
      val dn = model(df.withColumn(c, col(c) - lit(eps)))
        .select((idCols.map(col) :+ col(predCol).as("__dn")): _*)
      acc.join(up, idCols).join(dn, idCols)
        .withColumn(s"grad_$c", (col("__up") - col("__dn")) / lit(2.0 * eps))
        .drop("__up", "__dn")
    }

  /** U11 GradientxInput (explain.py:10-46): attribution_c = x_c · dY/dx_c
    * — the first-order Taylor contribution of each input cell. Adds one
    * `gxi_<col>` column per feature. */
  def gradientXInput(model: DataFrame => DataFrame, df: DataFrame,
                     idCols: Seq[String], xCols: Seq[String],
                     predCol: String, eps: Double = 0.5): DataFrame = {
    val withGrads = numericGradients(model, df, idCols, xCols, predCol, eps)
    val out = xCols.foldLeft(model(withGrads)) { (acc, c) =>
      acc.withColumn(s"gxi_$c", col(c) * col(s"grad_$c"))
    }
    out.drop(xCols.map(c => s"grad_$c"): _*)
  }

  /** U12 IntegratedGradients (explain.py:48-112, Sundararajan et al.):
    * IG_c = (x_c - x'_c) · ∫₀¹ dY/dx_c(x' + α(x - x')) dα, midpoint
    * Riemann sum with `steps` points. Each α probe is a transform of
    * the same DataFrame with the features linearly interpolated toward
    * the baseline — `steps · 2p` distributed forward passes, no driver
    * loop. Adds one `ig_<col>` column per feature. */
  def integratedGradients(model: DataFrame => DataFrame, df: DataFrame,
                          idCols: Seq[String], xCols: Seq[String],
                          baselines: Map[String, Double], predCol: String,
                          steps: Int = 8, eps: Double = 0.5): DataFrame = {
    require(steps >= 1, s"integratedGradients: steps must be >= 1, got $steps")
    val sums = (0 until steps).map { k =>
      val alpha = (k + 0.5) / steps
      val probe = xCols.foldLeft(df) { (acc, c) =>
        acc.withColumn(c,
          lit(baselines(c)) + lit(alpha) * (col(c) - lit(baselines(c))))
      }
      // gradient at the interpolated point, keyed back to the row
      numericGradients(model, probe, idCols, xCols, predCol, eps)
        .select((idCols.map(col) ++ xCols.map(c => col(s"grad_$c"))): _*)
    }
    val gradSum = sums.reduce { (a, b) =>
      val joined = a.join(b.withColumnsRenamed(
        xCols.map(c => s"grad_$c" -> s"__b_$c").toMap), idCols)
      xCols.foldLeft(joined) { (acc, c) =>
        acc.withColumn(s"grad_$c", col(s"grad_$c") + col(s"__b_$c"))
          .drop(s"__b_$c")
      }
    }
    val out = xCols.foldLeft(model(df).join(gradSum, idCols)) { (acc, c) =>
      acc.withColumn(s"ig_$c",
        (col(c) - lit(baselines(c))) * col(s"grad_$c") / lit(steps.toDouble))
    }
    out.drop(xCols.map(c => s"grad_$c"): _*)
  }
}
