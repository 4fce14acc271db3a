package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates (approximate, so spec-checked against exact
  * rather than oracle-hashed): HLL distinct counts and quantile
  * sketches — the cardinality/percentile estimators a 100 TB dedup
  * pipeline sizes itself with. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("HLL approx distinct tokens within 5% of exact") {
    val toks = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("token"))
    val row = toks.agg(
      countDistinct(col("token")).as("exact"),
      approx_count_distinct(col("token"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("quantile sketch brackets the exact median") {
    val li = Tables.lineitem(spark, d)
    val Array(approxMedian) =
      li.stat.approxQuantile("l_quantity", Array(0.5), 0.01)
    val n = li.count()
    val below = li.filter(col("l_quantity") <= approxMedian).count()
    val frac = below.toDouble / n
    assert(frac > 0.45 && frac < 0.56, s"median=$approxMedian frac=$frac")
  }
}
