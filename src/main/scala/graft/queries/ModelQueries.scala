package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.frame.Frame
import graft.model.LinearModel
import graft.explain.Explain

/** Model-layer queries: distributed closed-form fit (U1) and
  * Occlusion-1 attribution (U13). Both oracles mirror the exact IEEE
  * op order of the Scala implementations over exact decimal sums, so
  * comparisons are bit-exact with no rounding.
  */
object ModelQueries {

  private val statsSql =
    """WITH st AS (
      |  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |         CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM lineitem),
      | m AS (
      |  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |         (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
      |         sx / n AS mu, n FROM st)
      |""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // U1: exact distributed least-squares fit (decimal moment sums →
    // closed-form solve). One aggregation pass over the fact table.
    "u1_linear_fit" -> ((s, d) => {
      val (model, _, n, _) = fittedAll(s, d)
      import s.implicits._
      Seq((model.m(0), model.b, n)).toDF("slope", "intercept", "n")
    }),

    // U13: Occlusion-1 attribution of the fitted model on a 200-row
    // slice; for a linear model occlusion equals the analytic
    // m·(x-μ), which the oracle computes independently.
    "u13_occlusion" -> ((s, d) => {
      val (model, mu, slice) = fittedSlice(s, d)
      Explain.occlusion1(model.transform, slice,
        Seq(Frame.IDX), Seq("l_quantity"),
        Map("l_quantity" -> mu), "y_pred")
        .select("l_orderkey", "l_linenumber", "y_pred", "occl_l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "y_pred")
    }),

    // U11 GradientxInput: x·dY/dx with the gradient taken as a central
    // finite difference of the model's own forward plan (distributed
    // column expressions — no autograd, no driver loop). For the linear
    // model this equals the analytic x·m, which the oracle computes
    // independently; rounded to 4 digits — far enough below the
    // O(1e-9) central-difference noise floor that the noise can never
    // flip the rounded digit (6 digits left the boundary within noise).
    "u11_gradx" -> ((s, d) => {
      val (model, _, slice) = fittedSlice(s, d)
      Explain.gradientXInput(model.transform, slice,
        Seq(Frame.IDX), Seq("l_quantity"), "y_pred")
        .select(col("l_orderkey"), col("l_linenumber"), col("y_pred"),
          round(col("gxi_l_quantity"), 4).as("gxi_l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "y_pred")
    }),

    // U12 IntegratedGradients: (x-x')·∫ dY/dx over the straight path
    // from baseline μ, midpoint Riemann sum of numeric gradients
    // (α-probes × 2 shifted forward passes each, all distributed). For
    // the linear model IG equals the analytic m·(x-μ) at any step
    // count, so the gate uses 4 probes (each probe is 2 joins).
    "u12_intgrad" -> ((s, d) => {
      val (model, mu, slice) = fittedSlice(s, d)
      Explain.integratedGradients(model.transform, slice,
        Seq(Frame.IDX), Seq("l_quantity"),
        Map("l_quantity" -> mu), "y_pred", steps = 4)
        .select(col("l_orderkey"), col("l_linenumber"), col("y_pred"),
          round(col("ig_l_quantity"), 4).as("ig_l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "y_pred")
    })
  )

  /** Shared scaffolding for the fit/attribution queries: exact linear
    * fit over lineitem, the fitted column mean, and a positionally-
    * indexed 200-row slice. (l_orderkey, l_linenumber) is NOT unique in
    * the synthetic data: slices order by the full projection and the
    * attribution joins key on _idx. Memoized per scale dir — u1/u11/
    * u12/u13 would otherwise each re-run the fit aggregation and the
    * _idx materialization; released by `releaseCaches()`. */
  private val fitCache = scala.collection.mutable.Map[
    String, (LinearModel, Double, Long, org.apache.spark.sql.DataFrame)]()
  private[queries] def fittedSlice(s: SparkSession, d: String)
  : (LinearModel, Double, org.apache.spark.sql.DataFrame) = {
    val (m, mu, _, slice) = fittedAll(s, d); (m, mu, slice)
  }
  private[queries] def fittedAll(s: SparkSession, d: String)
  : (LinearModel, Double, Long, org.apache.spark.sql.DataFrame) = fitCache.synchronized {
    graft.DfMemo.getOrBuildVia(fitCache, d, s)(_._4.sparkSession) {
      val li = lineitem(s, d)
      val (slope, intercept) = LinearModel.fitSimple(li, "l_quantity", "l_extendedprice")
      val agg = li.agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double"),
        count(lit(1))).head()
      val n = agg.getLong(1)
      val mu = agg.getDouble(0) / n.toDouble
      val model = new LinearModel("li_linear", Seq("l_quantity"),
        "l_extendedprice", "y_pred",
        graft.model.ComponentMap.of("m" -> Array(slope), "b" -> Array(intercept)))
      val slice = Frame.fromDF(
        li.select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_orderkey", "l_linenumber", "l_quantity")).slice(0L, 200L)
        .df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (model, mu, n, slice)
    }
  }

  /** Unpersist and drop the memoized fit scaffolding. */
  def releaseCaches(): Unit = fitCache.synchronized {
    fitCache.values.foreach(_._4.unpersist(blocking = false))
    fitCache.clear()
  }

  def oracles: Map[String, String] = Map(
    "u1_linear_fit" -> (statsSql +
      """SELECT slope, intercept, CAST(n AS BIGINT) AS n FROM m""".stripMargin),
    "u13_occlusion" -> (statsSql +
      """, f AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity) - 1 AS src
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  (l_quantity * slope + intercept) AS y_pred,
        |  (l_quantity * slope + intercept) - (mu * slope + intercept) AS occl_l_quantity
        |FROM f, m WHERE src < 200 ORDER BY l_orderkey, l_linenumber, y_pred""".stripMargin),
    "u11_gradx" -> (statsSql +
      """, f AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity) - 1 AS src
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  (l_quantity * slope + intercept) AS y_pred,
        |  round(l_quantity * slope, 4) AS gxi_l_quantity
        |FROM f, m WHERE src < 200 ORDER BY l_orderkey, l_linenumber, y_pred""".stripMargin),
    "u12_intgrad" -> (statsSql +
      """, f AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity) - 1 AS src
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  (l_quantity * slope + intercept) AS y_pred,
        |  round((l_quantity - mu) * slope, 4) AS ig_l_quantity
        |FROM f, m WHERE src < 200 ORDER BY l_orderkey, l_linenumber, y_pred""".stripMargin)
  )
}
