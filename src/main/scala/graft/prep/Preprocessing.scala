package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.frame.Frame

/** Preprocessing operators (reference: fireworks/toolbox/preprocessing.py).
  */
object Preprocessing {

  /** U15 train_test_split (preprocessing.py:14-40): disjoint views.
    * Engine-agnostic deterministic split on a key expression: row goes
    * to test iff `key % k == slot`. The reference splits on a shuffled
    * index permutation; a key-hash split is the cluster-scale analogue
    * (stable under repartitioning, no global permutation state). */
  def splitByMod(f: Frame, keyCol: String, k: Int, testSlot: Int): (Frame, Frame) = {
    val cond = pmod(col(keyCol), lit(k)) === testSlot
    (f.mask(!cond), f.mask(cond))
  }

  /** Stratified sampling: per-class fractions with a seed (class-
    * balanced subsets for training pipelines; exact-fraction variant
    * of the reference's shuffled index splits). */
  def stratifiedSample(f: Frame, classCol: String,
                       fractions: Map[Any, Double], seed: Long): Frame = {
    val sampled = f.df.stat.sampleBy(classCol, fractions, seed)
    Frame.reindexPreservingOrder(sampled)
  }

  /** U15 seeded random split (Spark-native path). */
  def randomSplit(f: Frame, testFraction: Double, seed: Long): (Frame, Frame) = {
    val Array(tr, te) = f.df.randomSplit(Array(1 - testFraction, testFraction), seed)
    (Frame.reindexPreservingOrder(tr), Frame.reindexPreservingOrder(te))
  }
}

/** A1 Normalizer (preprocessing.py:49-129): two-phase z-score scaling.
  *
  * The reference accumulates running sums batch-by-batch (`update`),
  * finalizes mean/var (`compile`), then applies `(x-μ)/σ` (`forward`).
  * On Spark that is exactly partial+final hash aggregation → broadcast
  * of the tiny aggregate back into a map expression: one `agg` job,
  * one codegen'd projection — no per-batch driver state.
  *
  * Moments are accumulated in DECIMAL so the fit is exact and
  * order-invariant (a double sum would drift with partition order at
  * scale); the final μ/σ² are IEEE doubles derived from exact sums.
  */
final case class NormalizerModel(stats: Map[String, (Double, Double)]) {
  /** forward (preprocessing.py:75-88): z-score the fitted columns. */
  def transform(df: DataFrame): DataFrame =
    stats.foldLeft(df) { case (d, (c, (mean, variance))) =>
      d.withColumn(c, (col(c) - lit(mean)) / lit(math.sqrt(variance)))
    }
}

/** Normalizer as a first-class graft Model: μ/σ² live in a
  * ComponentMap (keys `mean:<col>`, `var:<col>`), so Scaffold
  * save/load and external sharing work like any other model. */
final class NormalizerGraftModel(val name: String, cols: Seq[String],
                                 val components: graft.model.ComponentMap)
    extends graft.model.Model {
  def transform(df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val mean = components(s"mean:$c")(0)
      val variance = components(s"var:$c")(0)
      d.withColumn(c, (col(c) - lit(mean)) / lit(math.sqrt(variance)))
    }
}

object Normalizer {

  /** Fit into the Model/ComponentMap/Scaffold state system. */
  def fitModel(df: DataFrame, cols: Seq[String],
               name: String = "normalizer"): NormalizerGraftModel = {
    val stats = fit(df, cols).stats
    val cm = new graft.model.ComponentMap
    stats.foreach { case (c, (m, v)) =>
      cm(s"mean:$c") = Array(m); cm(s"var:$c") = Array(v)
    }
    new NormalizerGraftModel(name, cols, cm)
  }
  /** update+compile (preprocessing.py:90-109) as one exact aggregation. */
  def fit(df: DataFrame, cols: Seq[String]): NormalizerModel = {
    def dec(c: Column): Column = c.cast("decimal(18,2)")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(dec(col(c))).cast("double").as(s"__sum_$c"),
        sum(dec(col(c)) * dec(col(c))).cast("double").as(s"__sumsq_$c"),
        count(col(c)).as(s"__n_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.map { c =>
      val s  = row.getAs[Double](s"__sum_$c")
      val ss = row.getAs[Double](s"__sumsq_$c")
      val n  = row.getAs[Long](s"__n_$c").toDouble
      val mean = s / n
      val variance = ss / n - mean * mean
      c -> (mean, variance)
    }.toMap
    NormalizerModel(stats)
  }

  def fitTransform(df: DataFrame, cols: Seq[String]): DataFrame =
    fit(df, cols).transform(df)
}
