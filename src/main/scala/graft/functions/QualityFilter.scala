package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Learned document-quality filter — the fastText-shaped arm (Joulin
  * et al. 2016, "Bag of Tricks for Efficient Text Classification")
  * next to the heuristic (x2/x24) and perplexity (x19/x22) filters:
  * a LINEAR classifier over hashed character-n-gram features, the
  * standard web-corpus quality model (CCNet/GPT-3-style pipelines
  * train exactly this shape against a trusted-vs-crawl label).
  *
  * Model: mean-pooled hashed char-3-gram buckets (`Buckets` = 256 —
  * the fastText hashing trick at fixture scale; production dials the
  * bucket count up, nothing else changes) into a linear probability
  * output: score(d) = w · x̄(d) + b, where x̄ is the per-doc mean
  * bucket-frequency vector. Training runs the repo's deterministic
  * [[graft.train.Trainer]] SGD on the labeled fixture below
  * (driver-side, KB-scale parameters — the documented boundary class);
  * the LEARNED weights are pinned here as integer micro constants and
  * CurationSpec re-trains and asserts bit-equality + convergence, the
  * u1 discipline.
  *
  * Scoring at corpus scale is ONE map pass with zero exchange: the
  * weight vector rides as a 256-long array LITERAL indexed by bucket
  * (O(1) `element_at`, no join, no UDF), per-doc totals are EXACT
  * long sums of micro weights with the x19 half-away integer mean, so
  * the keep decision can never flap on a ulp and the DuckDB oracle
  * (x47) replays the scoring pass bit-for-bit. PlanSpec pins the
  * no-shuffle scan.
  */
object QualityFilter {

  val Buckets = 256
  val NGram = 3

  /** The labeled training fixture: (text, label) with label 1.0 =
    * quality prose, 0.0 = junk (the boilerplate/noise classes a crawl
    * filter drops: character floods, digit/punct spam, keyword
    * stuffing). In-code so training is a pure function of the repo —
    * the same examples feed the spec's retrain pin. */
  val TrainingFixture: Seq[(String, Double)] = Seq(
    // quality: natural prose, varied vocabulary
    ("the committee reviewed the annual budget and approved new funding for local schools", 1.0),
    ("researchers published a detailed study on coastal erosion patterns in northern regions", 1.0),
    ("she walked through the quiet market early in the morning buying fresh bread and fruit", 1.0),
    ("the novel explores themes of memory and loss through the eyes of an aging painter", 1.0),
    ("engineers tested the bridge design under heavy load before opening it to traffic", 1.0),
    ("volunteers planted hundreds of trees along the river bank during the spring festival", 1.0),
    ("the orchestra performed a moving rendition of the symphony to a full concert hall", 1.0),
    ("historians debate the causes of the treaty and its influence on trade agreements", 1.0),
    ("farmers rotated their crops each season to keep the soil healthy and productive", 1.0),
    ("the museum opened a new exhibit featuring ancient pottery from the southern valley", 1.0),
    ("students presented their science projects and answered questions from the judges", 1.0),
    ("the pilot checked the weather report carefully before planning the long flight", 1.0),
    ("local bakeries compete every autumn to create the most inventive harvest pastry", 1.0),
    ("the documentary follows a family of otters living along a remote mountain stream", 1.0),
    ("careful planning and steady effort turned the small startup into a stable business", 1.0),
    ("the library extended its evening hours to support readers during exam season", 1.0),
    ("a gentle rain fell over the valley as the hikers returned to their cabin", 1.0),
    ("the recipe calls for fresh basil ripe tomatoes and a generous measure of olive oil", 1.0),
    ("city planners proposed wider sidewalks and more shade trees along the avenue", 1.0),
    ("the lecture covered the basics of probability with clear and memorable examples", 1.0),
    // junk: floods, spam, stuffing, digit noise
    ("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", 0.0),
    ("zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz", 0.0),
    ("1234567890 1234567890 1234567890 1234567890 1234567890", 0.0),
    ("!!! $$$ ### @@@ %%% ^^^ &&& *** ((( ))) !!! $$$ ###", 0.0),
    ("buy now buy now buy now buy now buy now buy now buy now", 0.0),
    ("click here click here click here click here click here", 0.0),
    ("xxxxx yyyyy xxxxx yyyyy xxxxx yyyyy xxxxx yyyyy xxxxx", 0.0),
    ("qqqqqqqq wwwwwwww qqqqqqqq wwwwwwww qqqqqqqq wwwwwwww", 0.0),
    ("00000 11111 00000 11111 00000 11111 00000 11111 00000", 0.0),
    ("free free free free win win win win prize prize prize", 0.0),
    ("asdf asdf asdf asdf asdf asdf asdf asdf asdf asdf asdf", 0.0),
    ("9999999999999999999999999999999999999999999999999999", 0.0),
    ("cheap cheap cheap deal deal deal sale sale sale now now", 0.0),
    ("kkkkkkkkkkkkkkkk mmmmmmmmmmmmmmmm kkkkkkkkkkkkkkkk", 0.0),
    ("a1b2c3d4e5f6g7h8i9j0 a1b2c3d4e5f6g7h8i9j0 a1b2c3d4", 0.0),
    (">>>>> <<<<< >>>>> <<<<< >>>>> <<<<< >>>>> <<<<< >>>>>", 0.0),
    ("lorem lorem lorem lorem lorem lorem lorem lorem lorem", 0.0),
    ("ggggg hhhhh ggggg hhhhh ggggg hhhhh ggggg hhhhh ggggg", 0.0),
    ("777 777 777 777 777 777 777 777 777 777 777 777 777", 0.0),
    ("subscribe subscribe subscribe like like like share share", 0.0))

  /** Bucket of one char-n-gram — first 8 md5 hex digits mod Buckets,
    * the DSIR bucket hash, reproduced bit-for-bit by Spark's md5 and
    * DuckDB's. */
  private[graft] def bucketOfLocal(gram: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % Buckets).toInt
  }

  /** Mean-pooled bucket-frequency features of a text (local twin of
    * the scoring kernel's gram stream; used by training + the spec). */
  private[graft] def featuresOf(text: String): Array[Double] = {
    val t = text.toLowerCase
    val x = new Array[Double](Buckets)
    val n = t.length - NGram + 1
    if (n <= 0) return x
    var i = 0
    while (i < n) {
      x(bucketOfLocal(t.substring(i, i + NGram))) += 1.0
      i += 1
    }
    var b = 0
    while (b < Buckets) { x(b) /= n; b += 1 }
    x
  }

  /** Train the fixture model with the repo Trainer (deterministic SGD;
    * see [[graft.train.Trainer.sgdLinear]]) and return the micro-
    * rounded (weights, bias). The shipped constants below ARE this
    * function's output — CurationSpec re-runs it and asserts equality,
    * so the pinned numbers can never drift from the trainer. */
  def trainDefault(spark: org.apache.spark.sql.SparkSession): (Array[Long], Long) = {
    import graft.train.Trainer
    val cols = (0 until Buckets).map(b => s"f$b")
    val rows = TrainingFixture.map { case (t, y) =>
      org.apache.spark.sql.Row.fromSeq(featuresOf(t).toSeq :+ y)
    }
    val schema = org.apache.spark.sql.types.StructType(
      (cols :+ "y").map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    val f = graft.frame.Frame.fromDF(df, cols :+ "y")
    // Adam: mean-pooled features have ‖x‖ ≤ 1 but per-bucket scale is
    // wildly heterogeneous (a character flood puts mass 1 on one
    // bucket, prose spreads ~1/len over dozens) — the adaptive second
    // moment equalizes that; plain SGD needs ~40× the epochs here.
    // Measured at this config: 40/40 training accuracy, min margin
    // 0.4992 around the 0.5 threshold.
    val m = Trainer.sgdLinear(f, cols, "y",
      Trainer.SgdConfig(lr = 0.1, epochs = 40, batchSize = 8, seed = 47L,
        optimizer = Trainer.Adam()))
    val w = m.components("m").map(v => math.round(v * 1e6))
    (w, math.round(m.components("b")(0) * 1e6))
  }

  /** The pinned trained model, integer micro (run
    * `graft.tools.TrainQualityFilter` to regenerate after changing
    * the fixture — CurationSpec fails if these drift from the
    * trainer's output). Filled by that tool's output. */
  val DefaultWeightsMicro: Array[Long] = QualityFilterWeights.W
  val DefaultBiasMicro: Long = QualityFilterWeights.B

  /** Corpus-scale scoring kernel: integer micro quality score of a
    * text column under (wMicro, biasMicro) — one zero-exchange
    * projection. score = halfAwayIntDiv(Σ_g w[bucket(g)], n) + bias,
    * which is exactly round-free integer w·x̄ + b; gram-less texts
    * (len < n-gram) score the bias alone. */
  def qualityScoreMicro(text: Column,
                        wMicro: Seq[Long], biasMicro: Long): Column = {
    require(wMicro.size == Buckets, s"need $Buckets weights")
    val warr = array(wMicro.map(lit): _*)
    val t = lower(text)
    val n = length(t) - (NGram - 1)
    val tot = aggregate(
      transform(sequence(lit(1), greatest(n, lit(0))),
        i => CurationFunctions.featureBucket(t.substr(i, lit(NGram)), Buckets)),
      lit(0L),
      (acc, bkt) => acc + element_at(warr, bkt.cast("int") + 1))
    // x19's exact half-away integer mean, in pure long arithmetic:
    // (2|tot|+n) DIV (2n) with the numerator made exactly divisible
    // via pmod, so the one double division is exact by construction
    // (both operands < 2^53 and the quotient is an integer) —
    // engine-independent, never flaps on a ulp
    val nL = n.cast("long")
    val num = lit(2L) * abs(tot) + nL
    val den = lit(2L) * nL
    val q = ((num - pmod(num, den)) / den).cast("long")
    when(n <= 0, lit(biasMicro))
      .otherwise(signum(tot).cast("long") * q + lit(biasMicro))
  }

  /** Integer micro quality score under the pinned default model;
    * the keep convention is `score_micro > 500000` (the
    * linear-probability threshold ½ — x47 emits both columns). */
  def qualityScore(text: Column): Column =
    qualityScoreMicro(text, DefaultWeightsMicro.toSeq, DefaultBiasMicro)
}
