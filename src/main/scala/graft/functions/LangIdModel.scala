package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Learned multi-class language-ID — the fastText-style classifier
  * (Joulin et al. 2016; the published lid.176 model is exactly this
  * shape) next to the stopword-voting heuristic (x1/x7): K one-vs-rest
  * LINEAR models over the same hashed char-3-gram mean features as
  * [[QualityFilter]] (shared bucket hash, shared scoring kernel),
  * predicted class = argmax of the per-class integer-micro scores with
  * class-order (alphabetical) tie-break.
  *
  * Training runs the repo's deterministic [[graft.train.Trainer]] on
  * the in-code multilingual fixture below, one binary head per class
  * (one-vs-rest, the standard reduction); the learned weights are
  * pinned in [[LangIdWeights]] as integer micro constants and
  * CurationSpec re-trains and asserts bit-equality — the x47
  * provenance discipline.
  *
  * Honesty note (COVERAGE decision row r18): the synthetic corpus's
  * stored `lang` label is SIGNAL-FREE — every language draws from the
  * same English token vocabulary (inspect any two rows), so accuracy
  * against that label measures nothing and x53 does not claim it.
  * What IS gated: the trained model's fixture accuracy (spec) and the
  * corpus SCORING pass bit-for-bit (x53's oracle replays all five
  * heads and the argmax exactly).
  *
  * Scale shape: scoring is ONE zero-exchange gram walk per row — the
  * fused kernel ([[scoresMicroFused]]) hashes each gram once and
  * accumulates all K heads' weights through a K-long array
  * accumulator (K× fewer md5 calls than the naive per-head walk;
  * the per-head twin [[scoresMicro]] stays as the reference and the
  * spec pins their bit-equality). */
object LangIdModel {

  /** Alphabetical — the argmax tie-break order. */
  val Classes: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** In-code multilingual training fixture (natural short sentences,
    * eight per class). The zh rows use hanzi: char-3-grams over CJK
    * text are the discriminative feature the published lid models
    * rely on. */
  val TrainingFixture: Seq[(String, String)] = Seq(
    ("de", "der ausschuss hat den haushalt geprüft und neue mittel für die schulen bewilligt"),
    ("de", "die forscher veröffentlichten eine ausführliche studie über die küstenerosion im norden"),
    ("de", "sie ging früh am morgen über den ruhigen markt und kaufte frisches brot und obst"),
    ("de", "der roman behandelt erinnerung und verlust aus der sicht eines alternden malers"),
    ("de", "die ingenieure prüften die brücke unter schwerer last bevor sie freigegeben wurde"),
    ("de", "freiwillige pflanzten hunderte bäume am flussufer während des frühlingsfestes"),
    ("de", "das orchester spielte eine bewegende fassung der sinfonie vor vollem haus"),
    ("de", "die bauern wechselten jede saison die feldfrüchte um den boden gesund zu halten"),
    ("en", "the committee reviewed the annual budget and approved new funding for local schools"),
    ("en", "researchers published a detailed study on coastal erosion patterns in northern regions"),
    ("en", "she walked through the quiet market early in the morning buying fresh bread and fruit"),
    ("en", "the novel explores themes of memory and loss through the eyes of an aging painter"),
    ("en", "engineers tested the bridge design under heavy load before opening it to traffic"),
    ("en", "volunteers planted hundreds of trees along the river bank during the spring festival"),
    ("en", "the orchestra performed a moving rendition of the symphony to a full concert hall"),
    ("en", "farmers rotated their crops each season to keep the soil healthy and productive"),
    ("es", "el comité revisó el presupuesto anual y aprobó nuevos fondos para las escuelas locales"),
    ("es", "los investigadores publicaron un estudio detallado sobre la erosión costera del norte"),
    ("es", "ella caminó por el mercado tranquilo temprano en la mañana comprando pan fresco y fruta"),
    ("es", "la novela explora la memoria y la pérdida a través de los ojos de un pintor anciano"),
    ("es", "los ingenieros probaron el puente bajo carga pesada antes de abrirlo al tráfico"),
    ("es", "los voluntarios plantaron cientos de árboles junto al río durante la fiesta de primavera"),
    ("es", "la orquesta interpretó una versión conmovedora de la sinfonía ante la sala llena"),
    ("es", "los agricultores rotaron sus cultivos cada temporada para mantener el suelo sano"),
    ("fr", "le comité a examiné le budget annuel et approuvé de nouveaux fonds pour les écoles"),
    ("fr", "les chercheurs ont publié une étude détaillée sur l'érosion côtière des régions du nord"),
    ("fr", "elle a traversé le marché calme tôt le matin pour acheter du pain frais et des fruits"),
    ("fr", "le roman explore la mémoire et la perte à travers les yeux d'un peintre vieillissant"),
    ("fr", "les ingénieurs ont testé le pont sous une lourde charge avant de l'ouvrir au trafic"),
    ("fr", "des bénévoles ont planté des centaines d'arbres le long de la rivière au printemps"),
    ("fr", "l'orchestre a donné une interprétation émouvante de la symphonie devant une salle pleine"),
    ("fr", "les agriculteurs alternaient leurs cultures chaque saison pour garder un sol sain"),
    ("zh", "委员会审查了年度预算并批准了对当地学校的新拨款"),
    ("zh", "研究人员发表了一项关于北部沿海侵蚀模式的详细研究"),
    ("zh", "她清晨走过安静的市场购买新鲜的面包和水果"),
    ("zh", "这部小说通过一位年迈画家的眼睛探讨记忆与失去"),
    ("zh", "工程师在开放交通之前对桥梁进行了重载测试"),
    ("zh", "志愿者在春季节日期间沿河岸种植了数百棵树"),
    ("zh", "乐团在满座的音乐厅演奏了动人的交响曲"),
    ("zh", "农民每个季节轮换作物以保持土壤健康和肥沃"))

  /** Train the K one-vs-rest heads with the repo Trainer (same
    * deterministic Adam config family as [[QualityFilter
    * .trainDefault]]) and return per class the micro-rounded
    * (weights, bias), in [[Classes]] order. The shipped
    * [[LangIdWeights]] constants ARE this function's output —
    * CurationSpec re-runs it and asserts equality. */
  def trainDefault(spark: org.apache.spark.sql.SparkSession): Seq[(Array[Long], Long)] = {
    import graft.train.Trainer
    val cols = (0 until QualityFilter.Buckets).map(b => s"f$b")
    val feats = TrainingFixture.map { case (_, t) => QualityFilter.featuresOf(t) }
    Classes.map { cls =>
      val rows = TrainingFixture.zip(feats).map { case ((l, _), x) =>
        org.apache.spark.sql.Row.fromSeq(x.toSeq :+ (if (l == cls) 1.0 else 0.0))
      }
      val schema = org.apache.spark.sql.types.StructType(
        (cols :+ "y").map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.DoubleType, nullable = false)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      val f = graft.frame.Frame.fromDF(df, cols :+ "y")
      val m = Trainer.sgdLinear(f, cols, "y",
        Trainer.SgdConfig(lr = 0.1, epochs = 60, batchSize = 8, seed = 53L,
          optimizer = Trainer.Adam()))
      (m.components("m").map(v => math.round(v * 1e6)),
        math.round(m.components("b")(0) * 1e6))
    }
  }

  /** The pinned trained heads, integer micro, [[Classes]] order (run
    * `graft.tools.TrainLangId` to regenerate after changing the
    * fixture). */
  def defaultHeads: Seq[(Array[Long], Long)] =
    LangIdWeights.W.zip(LangIdWeights.B).map { case (w, b) => (w, b) }

  /** Per-class integer-micro scores of a text column — K evaluations
    * of the shared [[QualityFilter.qualityScoreMicro]] kernel, zero
    * exchange. */
  def scoresMicro(text: Column,
                  heads: Seq[(Array[Long], Long)] = defaultHeads): Seq[(String, Column)] =
    Classes.zip(heads).map { case (cls, (w, b)) =>
      cls -> QualityFilter.qualityScoreMicro(text, w.toSeq, b)
    }

  /** FUSED per-class integer-micro scores: ONE gram walk hashing each
    * char-3-gram once, accumulating all K heads through a K-long
    * array (vs K walks = K md5 calls per gram in [[scoresMicro]] —
    * the constant factor that matters when K grows toward the lid.176
    * shape's 176 heads). Arithmetic is identical element-wise: exact
    * long weight sums, then the x19 half-away integer mean + bias per
    * head — the spec pins bit-equality with the per-head kernel, so
    * x53's oracle replay covers both. Returns array<long> in
    * [[Classes]] order. */
  def scoresMicroFused(text: Column,
                       heads: Seq[(Array[Long], Long)] = defaultHeads): Column = {
    val k = heads.size
    val allW = array(heads.map { case (w, _) => array(w.map(lit): _*) }: _*)
    val biases = array(heads.map { case (_, b) => lit(b) }: _*)
    val t = lower(text)
    val n = length(t) - (QualityFilter.NGram - 1)
    val totals = aggregate(
      transform(sequence(lit(1), greatest(n, lit(0))),
        i => CurationFunctions.featureBucket(
          t.substr(i, lit(QualityFilter.NGram)), QualityFilter.Buckets)),
      array(Seq.fill(k)(lit(0L)): _*),
      (acc, bkt) => {
        val idx = bkt.cast("int") + 1
        transform(acc, (a, hk) =>
          a + element_at(element_at(allW, hk + 1), idx))
      })
    // per-head exact half-away integer mean + bias (QualityFilter
    // .qualityScoreMicro's arithmetic, applied element-wise)
    val nL = n.cast("long")
    transform(totals, (tot, hk) => {
      val num = lit(2L) * abs(tot) + nL
      val den = lit(2L) * nL
      val q = ((num - pmod(num, den)) / den).cast("long")
      when(n <= 0, element_at(biases, hk + 1))
        .otherwise(signum(tot).cast("long") * q + element_at(biases, hk + 1))
    })
  }

  /** Predicted class + its micro score: argmax over the FUSED head
    * scores (one gram walk), STRICTLY-greater fold so ties keep the
    * earliest (alphabetical) class — the convention x53's oracle
    * replays. */
  def predict(text: Column,
              heads: Seq[(Array[Long], Long)] = defaultHeads): Column = {
    val classes = array(Classes.map(lit): _*)
    val scored = zip_with(scoresMicroFused(text, heads), classes,
      (m, c) => struct(m.as("m"), c.as("lang")))
    aggregate(slice(scored, 2, heads.size - 1),
      element_at(scored, 1),
      (acc, h) => when(h.getField("m") > acc.getField("m"), h).otherwise(acc))
  }
}
