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

  /** Deterministic stratified sampling: within each class, rows are
    * ranked by md5(seed:key) and the first ceil(fraction·classCount)
    * kept. Engine-reproducible (no RNG state — the same rows are chosen
    * on any cluster size, any partitioning, and by the SQL oracle) and
    * one shuffle on the class column; both window functions share the
    * same partitioning so Spark plans a single Exchange. */
  /** Deterministic exact-k sample per group: the k members with the
    * smallest md5(seed:key) ranks — a reproducible "stable eval-set
    * draw" (re-running on the same corpus, or on a superset, keeps
    * previously drawn members unless displaced by new smaller ranks).
    *
    * Scale shape: the rank heap is the bounded_topk
    * TypedImperativeAggregate — map-side combining, so the exchange
    * carries at most k rows per (task, group), never the group's
    * population (the ANN-rerank shape; a row_number window would
    * shuffle every row to rank them and throw away all but k). */
  def deterministicGroupSample(df: DataFrame, groupCol: String,
                               keyCol: String, k: Int,
                               seed: String): DataFrame = {
    require(k >= 1, "need k >= 1")
    val h = md5(concat_ws(":", lit(seed), col(keyCol).cast("string")))
    df.groupBy(groupCol)
      .agg(graft.expressions.TopKAggregate.bounded_topk(
        struct(h.as("__h"), col(keyCol).as("__t")),
        struct(col(keyCol).as("__k")), k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol),
        (col("pos") + 1).cast("int").as("draw"),
        col("col.__k").as(keyCol))
  }

  /** Deterministic weighted exact-k sample per group (Efraimidis &
    * Spirtakis 2006): each row draws u = md5-uniform(seed:key) and
    * ranks by ln(u)/w — the k LARGEST ranks are a weighted sample
    * without replacement (inclusion odds ∝ weight), reproducible
    * across runs and engines. The importance-weighted twin of
    * [[deterministicGroupSample]]; same bounded_topk map-side heap,
    * so the exchange carries ≤ k rows per (task, group).
    *
    * Rows with weight <= 0 are excluded (their ES key is 0 — never
    * selected ahead of any positive weight; dropping them keeps the
    * rank expression total). ln is evaluated identically by both
    * engines on the same 52-bit u (the x19/x22 LM-scoring precedent);
    * a cross-engine flip would need two ranks within one ulp. */
  def weightedGroupSample(df: DataFrame, groupCol: String, keyCol: String,
                          weightCol: String, k: Int,
                          seed: String): DataFrame = {
    require(k >= 1, "need k >= 1")
    // u in (0, 1]: 13 hex digits of md5 (52 bits, exact in a double),
    // +1 in the numerator so u is never 0 (ln(0) = -Inf is fine for
    // ES but NULL-prone in SQL round-trips)
    val u = (conv(substring(md5(concat_ws(":", lit(seed),
        col(keyCol).cast("string"))), 1, 13), 16, 10).cast("double") + 1.0) /
      pow(lit(16.0), lit(13.0))
    val rank = log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).cast("double") > 0)
      .groupBy(groupCol)
      .agg(graft.expressions.TopKAggregate.bounded_topk(
        struct((-rank).as("__r"), col(keyCol).as("__t")),
        struct(col(keyCol).as("__k")), k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol),
        (col("pos") + 1).cast("int").as("draw"),
        col("col.__k").as(keyCol))
  }

  def stratifiedSampleByHash(df: DataFrame, classCol: String,
                             keyCols: Seq[String], fraction: Double,
                             seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat_ws(":", lit(seed) +: keyCols.map(c => col(c).cast("string")): _*))
    val byClass = Window.partitionBy(classCol)
    val rk = byClass.orderBy(h.asc +: keyCols.map(col(_).asc): _*)
    df.withColumn("__rk", row_number().over(rk))
      .withColumn("__n", count(lit(1)).over(byClass))
      .filter(col("__rk") <= ceil(lit(fraction) * col("__n")))
      .drop("__rk", "__n")
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
  * Moments are accumulated in DECIMAL(precision, scale) so the fit is
  * order-invariant (a double sum would drift with partition order at
  * scale). NOTE the quantization this implies: inputs are rounded to
  * `scale` fractional decimal digits before summing, so the fit is
  * exact only for data with at most `scale` decimal places (e.g. the
  * default scale=2 fits monetary TPC-H columns exactly); for
  * finer-grained data pass a larger scale (the precision/scale pair
  * must keep `2·precision <= 38` so squared terms stay representable).
  * Values whose integer part exceeds `precision - scale` digits would
  * overflow the cast to null and silently vanish from the sum — `fit`
  * detects that and fails loudly instead.
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
  /** update+compile (preprocessing.py:90-109) as one aggregation.
    * Exact for inputs with <= `scale` fractional decimal digits (see
    * class note on quantization); throws if any value overflows the
    * decimal cast instead of silently dropping it from the sum. */
  def fit(df: DataFrame, cols: Seq[String],
          precision: Int = 18, scale: Int = 2): NormalizerModel = {
    require(2 * precision <= 38,
      s"fit: 2*precision must be <= 38 so squared terms stay in decimal range, got $precision")
    def dec(c: Column): Column = c.cast(s"decimal($precision,$scale)")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(dec(col(c))).cast("double").as(s"__sum_$c"),
        sum(dec(col(c)) * dec(col(c))).cast("double").as(s"__sumsq_$c"),
        count(col(c)).as(s"__n_$c"),
        count(dec(col(c))).as(s"__ndec_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.map { c =>
      val n    = row.getAs[Long](s"__n_$c")
      val ndec = row.getAs[Long](s"__ndec_$c")
      if (ndec != n) throw new ArithmeticException(
        s"Normalizer.fit: ${n - ndec} value(s) of '$c' overflow decimal($precision,$scale); " +
          "raise `precision` (values would otherwise be silently dropped from the sums)")
      val s  = row.getAs[Double](s"__sum_$c")
      val ss = row.getAs[Double](s"__sumsq_$c")
      val mean = s / n.toDouble
      val variance = ss / n.toDouble - mean * mean
      c -> (mean, variance)
    }.toMap
    NormalizerModel(stats)
  }

  def fitTransform(df: DataFrame, cols: Seq[String]): DataFrame =
    fit(df, cols).transform(df)
}
