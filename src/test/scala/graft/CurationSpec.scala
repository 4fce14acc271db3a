package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CurationFunctions._

/** Hand-computed fixtures for the curation operators (the oracle pins
  * them statistically at corpus scale; these pin the semantics). */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("domainMixWeights upweights small sources (α = 0.5 temperature)") {
    // big: 4 docs × 4 tokens = 16 tokens; small: 1 doc × 4 tokens
    val docs = ((1 to 4).map(i => (i.toLong, "a b c d", "big")) :+
      ((9L, "a b c d", "small"))).toDF("doc_id", "text", "source")
    val out = domainMixWeights(docs, "doc_id", "text", "source", targetFrac = 0.5)
      .select("source", "toks", "weight", "keep_rate")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("big")._2 == 16L && out("small")._2 == 4L)
    // α=0.5: raw weights √16 : √4 = 2 : 1 → 2/3, 1/3 — the small
    // source holds 20% of tokens but gets 33% of the sampled mass
    assert(out("big")._3 == 0.666667 && out("small")._3 == 0.333333)
    // keep_rate = targetFrac · total · w / cnt: small is oversampled
    // (0.5·20·(1/3)/4 = 0.833) vs big (0.5·20·(2/3)/16 = 0.417)
    assert(out("small")._4 == 0.833333 && out("big")._4 == 0.416667)
  }

  test("packSequences bins docs by running token offset within source") {
    // token counts 100, 200, 30 at budget 128: offsets 0, 100, 300
    // → bins 0, 0, 2 (doc 2 straddles; doc 3 starts in bin 2)
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((1L, words(100), "s"), (2L, words(200), "s"), (3L, words(30), "s"))
      .toDF("doc_id", "text", "source")
    val out = packSequences(docs, "doc_id", "text", "source", budget = 128)
      .select("bin", "n_docs", "n_tokens").as[(Int, Int, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, 2, 300L), (2, 1, 30L)))
  }

  test("domainMixSample keeps exactly the docs domainMixWeights counts") {
    val docs = ((1 to 40).map(i => (i.toLong, "a b c d e f g h", "big")) ++
      (100 to 104).map(i => (i.toLong, "a b c d e f g h", "small")))
      .toDF("doc_id", "text", "source")
    val report = domainMixWeights(docs, "doc_id", "text", "source", targetFrac = 0.5)
      .select("source", "kept_docs").as[(String, Int)].collect().toMap
    val sample = domainMixSample(docs, "doc_id", "text", "source", targetFrac = 0.5)
    assert(sample.columns.toSeq == Seq("doc_id", "text", "source")) // shape preserved
    val bySource = sample.groupBy("source").count()
      .as[(String, Long)].collect().toMap.view.mapValues(_.toInt).toMap
    assert(report.filter(_._2 > 0) == bySource) // same decision, same counts
  }

  test("gopherFlags rules fire independently on crafted documents") {
    val good = Seq.fill(10)("the of and data item code").mkString(" ") // 60 words
    val short = "tiny doc"                                  // fails wc
    val symbols = Seq.fill(60)("#").mkString(" ")           // fails sym/alpha/mwl/stop
    val longWords = Seq.fill(60)("aaaaaaaaaaaaaaaa").mkString(" ") // fails mwl/stop
    val docs = Seq((1L, good), (2L, short), (3L, symbols), (4L, longWords))
      .toDF("doc_id", "text")
    val out = gopherFlags(docs, "doc_id", "text")
      .select("doc_id", "n_words", "stop_distinct", "wc_ok", "mwl_ok",
        "sym_ok", "alpha_ok", "stop_ok", "keep")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 60, 3, 1, 1, 1, 1, 1, 1)))     // keeps
    assert(out(2L)._4 == 0 && out(2L)._9 == 0)             // word count
    assert(out(3L)._6 == 0 && out(3L)._7 == 0 && out(3L)._9 == 0) // symbols
    assert(out(4L)._5 == 0 && out(4L)._8 == 0 && out(4L)._9 == 0) // mean len
  }

  test("normalizedDedup groups case/punct/whitespace variants") {
    val docs = Seq((1L, "Hello, World!"), (2L, "hello world"),
      (3L, "HELLO  world..."), (4L, "different text")).toDF("doc_id", "text")
    val out = normalizedDedup(docs, "doc_id", "text")
      .select("canonical_id", "n_docs").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 3)))
  }

  test("lmPerplexity matches hand-computed add-0.5 bigram logprobs") {
    import graft.functions.TextAnalysisFunctions.lmPerplexity
    // corpus bigrams: doc1 "a b a b" -> (a,b),(b,a),(a,b); doc2 "a b"
    // -> (a,b). Counts: cb(a,b)=3, cb(b,a)=1; heads cu(a)=3, cu(b)=1;
    // vocab V=2.
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = lmPerplexity(docs, "doc_id", "text", alpha = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    def micro(cb: Long, cu: Long): Long =
      math.round(math.log((cb + 0.5) / (cu + 0.5 * 2)) * 1e6)
    val mAB = micro(3, 3) // ln(3.5/4)
    val mBA = micro(1, 1) // ln(1.5/2)
    def expect(micros: Seq[Long]): (Double, Double) = {
      val s = micros.sum; val n = micros.size
      // exact integer half-away division — the operator's contract
      val q = (if (s < 0) -1L else 1L) * ((2 * math.abs(s) + n) / (2L * n))
      val mean = (s.toDouble / 1e6) / n
      (q.toDouble / 1e6, math.rint(math.exp(-mean) * 1e6) / 1e6)
    }
    val (lp1, ppl1) = expect(Seq(mAB, mBA, mAB))
    val (lp2, ppl2) = expect(Seq(mAB))
    assert(out.toSeq == Seq((1L, 3L, lp1, ppl1), (2L, 1L, lp2, ppl2)))
  }

  test("lmPerplexityAgainst: unseen bigrams hit the smoothed floor of the reference LM") {
    import graft.functions.TextAnalysisFunctions.lmPerplexityAgainst
    // reference: two copies of "a b" -> cb(a,b)=2, cu(a)=2, V=2
    val ref = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    // seen bigram: ln(2.5/3); fully unseen head: ln(0.5/(0 + 0.5*2)) = ln(1/2)
    val docs = Seq((10L, "a b"), (11L, "x y")).toDF("doc_id", "text")
    val out = lmPerplexityAgainst(ref, docs, "doc_id", "text", alpha = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect().toSeq
    def lp(x: Double): Double = math.rint(math.log(x) * 1e6) / 1e6
    assert(out == Seq((10L, 1L, lp(2.5 / 3)), (11L, 1L, lp(0.5))))
  }

  test("sentenceSplit: boundaries, protected prefixes, quotes, decimals") {
    import graft.functions.TextAnalysisFunctions.sentenceSplit
    val docs = Seq(
      (1L, "Dr. Smith went home. He slept! \"Really?\" Yes. Version 3.5 works."),
      (2L, "no punctuation here"),
      (3L, "Trailing spaces.   Next one."),
      (4L, "Line one.\nLine two.\t Line three."), // whitespace-run gaps
      (5L, "Stray\u0001marker. And\u0002parked dot.") // in-band bytes stripped
    ).toDF("doc_id", "text")
    val out = sentenceSplit(docs, "doc_id", "text")
      .orderBy("doc_id", "sent_idx")
      .as[(Long, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1, "Dr. Smith went home."), // protected prefix does NOT split
      (1L, 2, "He slept!"),
      (1L, 3, "\"Really?\""), // boundary consumes the opening quote
      (1L, 4, "Yes."),
      (1L, 5, "Version 3.5 works."), // decimal point is no boundary
      (2L, 1, "no punctuation here"),
      (3L, 1, "Trailing spaces."),
      (3L, 2, "Next one."),
      (4L, 1, "Line one."), // newline and tab+space gaps both split
      (4L, 2, "Line two."),
      (4L, 3, "Line three."),
      (5L, 1, "Straymarker."), // input marker bytes never corrupt
      (5L, 2, "Andparked dot.")))
  }

  test("lmStupidBackoff descends the three levels exactly (Brants 2007 ratios)") {
    import graft.functions.TextAnalysisFunctions.lmStupidBackoffAgainst
    // reference: "a b c", "b c d" → tri (a,b,c)=1,(b,c,d)=1;
    // bi (a,b)=1,(b,c)=2,(c,d)=1; uni a=1,b=2,c=2,d=1; N=6, V=4
    val ref = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b c"), // seen trigram: t/b = 1/1 → lp 0
      (11L, "a b d"), // tri+bi(b,d) unseen → floor 0.16·(1+0.5)/8
      (12L, "x b c"), // tri unseen, bi (b,c) seen → 0.4·2/2
      (13L, "x y z")  // fully OOV → floor 0.16·(0+0.5)/8
    ).toDF("doc_id", "text")
    val out = lmStupidBackoffAgainst(ref, docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_trigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect().toSeq
    // replicate the operator's float-op order exactly
    def lp(x: Double): Double = math.rint(math.log(x) * 1e6) / 1e6
    val floor11 = 0.16 * (1.0 + 0.5) / (6.0 + 0.5 * 4.0)
    val back12 = 0.4 * 2.0 / 2.0
    val floor13 = 0.16 * (0.0 + 0.5) / (6.0 + 0.5 * 4.0)
    assert(out == Seq((10L, 1L, 0.0), (11L, 1L, lp(floor11)),
      (12L, 1L, lp(back12)), (13L, 1L, lp(floor13))))
    // backoff monotonicity on this fixture: exact > one-step > floors
    assert(0.0 > lp(back12) && lp(back12) > lp(floor11) &&
      lp(floor11) > lp(floor13))
  }

  test("lmStupidBackoff self-trained: every trigram seen, ratios are raw counts") {
    import graft.functions.TextAnalysisFunctions.lmStupidBackoff
    // corpus "a b c a b c": trigrams (a,b,c)=2,(b,c,a)=1,(c,a,b)=1;
    // bigrams (a,b)=2,(b,c)=2,(c,a)=1 — every position level-3
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val out = lmStupidBackoff(docs, "doc_id", "text")
      .select("doc_id", "n_trigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect().toSeq
    def m(x: Double): Long = math.round(math.log(x) * 1e6)
    // positions: abc, bca, cab, abc → micros ln(2/2), ln(1/2), ln(1/1), ln(2/2)
    val micros = Seq(m(2.0 / 2.0), m(1.0 / 2.0), m(1.0 / 1.0), m(2.0 / 2.0))
    val s = micros.sum; val n = micros.size
    val q = (if (s < 0) -1L else 1L) * ((2 * math.abs(s) + n) / (2L * n))
    assert(out == Seq((1L, 4L, q.toDouble / 1e6)))
  }

  test("lmPerplexity ranks a gibberish doc below the modal phrasing") {
    import graft.functions.TextAnalysisFunctions.lmPerplexity
    // 20 copies of the same sentence + one scrambled outlier: the
    // outlier's bigrams are unseen (count-0, smoothed) so its
    // perplexity must be strictly higher
    val common = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val docs = (common :+ ((99L, "mat the on sat cat the"))).toDF("doc_id", "text")
    val out = lmPerplexity(docs, "doc_id", "text", alpha = 0.5)
      .select("doc_id", "perplexity")
      .as[(Long, Double)].collect().toMap
    assert(out(99L) > out(1L) * 2,
      s"outlier ppl ${out(99L)} vs common ${out(1L)}")
  }

  test("qualityDeciles: bands partition the corpus with monotone boundaries") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = qualityDeciles(docs, "doc_id", "text")
      .orderBy("decile")
      .select("decile", "n", "min_q", "max_q")
      .as[(Int, Int, Double, Double)].collect()
    assert(out.map(_._2.toLong).sum == docs.count())
    // value-disjoint, ordered bands: each band's min exceeds the
    // previous band's max (ties collapse into one band by design)
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._4 < b._3, s"$a vs $b")
      case _ =>
    }
    assert(out.forall(r => r._3 <= r._4))
  }

  test("deterministicGroupSample: exact k, reproducible, superset-stable, partitioning-invariant") {
    import graft.prep.Preprocessing.deterministicGroupSample
    val base = (1L to 40L).map(i => (if (i % 2 == 0) "a" else "b", i))
      .toDF("grp", "k")
    def draw(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
      deterministicGroupSample(df, "grp", "k", k = 5, seed = "s1")
        .orderBy("grp", "draw").as[(String, Int, Long)].collect()
        .groupBy(_._1).map { case (g, rs) => g -> rs.sortBy(_._2).map(_._3).toSeq }
    val d1 = draw(base)
    assert(d1.keySet == Set("a", "b") && d1.values.forall(_.size == 5))
    // reproducible and independent of physical partitioning (the heap
    // merge is order-insensitive)
    assert(draw(base.repartition(13)) == d1)
    // superset stability: adding rows can only DISPLACE draws with
    // smaller-rank newcomers, never perturb the survivors' membership
    val more = base.unionByName((41L to 60L)
      .map(i => (if (i % 2 == 0) "a" else "b", i)).toDF("grp", "k"))
    val d2 = draw(more)
    for (g <- Seq("a", "b")) {
      val kept = d2(g).filter(_ <= 40L).toSet
      assert(kept.subsetOf(d1(g).toSet), s"$g: $kept not in ${d1(g)}")
    }
  }

  test("weightedGroupSample matches the ES reference; zero/negative weights excluded; k > group") {
    import graft.prep.Preprocessing.weightedGroupSample
    // weights spanning 3 orders of magnitude + zero/negative rows
    val rows = (1L to 30L).map(i =>
      ("g" + (i % 2), i, if (i % 7 == 0) 0.0 else if (i % 11 == 0) -1.0
        else math.pow(10.0, (i % 3).toDouble) + i * 0.01))
    val df = rows.toDF("grp", "k", "w")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the production rank math, replayed exactly
    def rank(id: Long, w: Double): Double = {
      val u = (java.lang.Long.parseLong(md5hex(s"s2:$id").take(13), 16) + 1.0) /
        math.pow(16.0, 13.0)
      math.log(u) / w
    }
    val want = rows.filter(_._3 > 0).groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, rank(r._2, r._3)))
        .sortBy { case (id, rk) => (-rk, id) }.take(8).map(_._1).toSeq
    }
    val got = weightedGroupSample(df, "grp", "k", "w", k = 8, seed = "s2")
      .orderBy("grp", "draw").as[(String, Int, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got == want, s"got $got want $want")
    // k larger than a group's positive-weight population: returns all
    val small = Seq(("z", 1L, 1.0), ("z", 2L, 5.0), ("z", 3L, 0.0)).toDF("grp", "k", "w")
    val allOf = weightedGroupSample(small, "grp", "k", "w", k = 10, seed = "s2")
      .as[(String, Int, Long)].collect()
    assert(allOf.length == 2 && allOf.map(_._3).toSet == Set(1L, 2L))
  }

  test("urlCanonicalize: the 6 rules, idempotence, and non-URL passthrough") {
    import graft.functions.WebFunctions._
    val cases = Seq(
      // scheme/host case + default port + fragment + tracking + sort
      ("HTTPS://User.Example.COM:443/A/b?z=2&utm_source=x&a=1#sec",
        "https://user.example.com/A/b?a=1&z=2", "example.com"),
      // http keeps :443 (not its default), path case preserved
      ("http://h.org:443/P", "http://h.org:443/P", "h.org"),
      ("http://h.org:80/P", "http://h.org/P", "h.org"),
      // empty path -> '/', all-tracking query drops entirely
      ("http://x.io?fbclid=1&gclid=2&utm_a=3", "http://x.io/", "x.io"),
      // non-URL passthrough (canonicalization invents no structure)
      ("not a url", "not a url", ""),
      ("ftp://Files.Site.net:21/x", "ftp://files.site.net:21/x", "site.net"))
    val out = cases.map(_._1).toDF("url")
      .select(urlCanonicalize(col("url")).as("c"), urlDomain(col("url")).as("d"))
      .as[(String, String)].collect().toSeq
    assert(out == cases.map(c => (c._2, c._3)), s"got $out")
    // idempotence: canonical output is its own canonical form
    val again = cases.map(_._2).toDF("url")
      .select(urlCanonicalize(col("url")).as("c")).as[String].collect().toSeq
    assert(again == cases.map(_._2), s"not idempotent: $again")
  }

  test("quality filter: pinned weights ARE the trainer's output; training separates the fixture") {
    import graft.functions.QualityFilter
    // provenance pin (the u1 discipline): re-run the deterministic
    // Adam training and assert bit-equality with the shipped
    // constants — they can never drift from the trainer silently
    val (w, b) = QualityFilter.trainDefault(spark)
    assert(w.toSeq == QualityFilter.DefaultWeightsMicro.toSeq,
      "pinned weights differ from the trainer's output — regenerate " +
        "with graft.tools.TrainQualityFilter")
    assert(b == QualityFilter.DefaultBiasMicro)
    // convergence: the learned model separates every fixture example
    // under the exact micro threshold the corpus filter uses
    val correct = QualityFilter.TrainingFixture.count { case (t, y) =>
      val x = QualityFilter.featuresOf(t)
      val tot = x.zip(w).map { case (xi, wi) => xi * wi }.sum + b
      (tot > 500000.0) == (y > 0.5)
    }
    assert(correct == QualityFilter.TrainingFixture.size,
      s"training did not converge: $correct/${QualityFilter.TrainingFixture.size}")
    // and the distributed scoring kernel agrees with the local replay
    // on the fixture texts (same buckets, same integer mean)
    val scored = QualityFilter.TrainingFixture.map(_._1).toDF("text")
      .select(QualityFilter.qualityScore(col("text")).as("m"))
      .as[Long].collect().toSeq
    val kept = scored.map(_ > 500000L)
    assert(kept == QualityFilter.TrainingFixture.map(_._2 > 0.5),
      s"kernel keep decisions diverge: $scored")
  }

  test("learned language-ID: pinned heads ARE the trainer's output; argmax classifies the fixture") {
    import graft.functions.LangIdModel
    // provenance pin: re-run the deterministic one-vs-rest training
    // and assert bit-equality with the shipped constants
    val heads = LangIdModel.trainDefault(spark)
    LangIdModel.Classes.indices.foreach { k =>
      assert(heads(k)._1.toSeq == LangIdModel.defaultHeads(k)._1.toSeq,
        s"pinned weights for class ${LangIdModel.Classes(k)} differ " +
          "from the trainer's output — regenerate with graft.tools.TrainLangId")
      assert(heads(k)._2 == LangIdModel.defaultHeads(k)._2)
    }
    // convergence: argmax over the heads labels every fixture row
    // correctly (40/40 at the pinned config)
    import graft.functions.QualityFilter
    val correct = LangIdModel.TrainingFixture.count { case (lang, t) =>
      val x = QualityFilter.featuresOf(t)
      val scores = heads.map { case (w, b) =>
        x.zip(w).map { case (xi, wi) => xi * wi }.sum + b
      }
      scores.zip(LangIdModel.Classes)
        .reduceLeft((a, h) => if (h._1 > a._1) h else a)._2 == lang
    }
    assert(correct == LangIdModel.TrainingFixture.size,
      s"training did not converge: $correct/${LangIdModel.TrainingFixture.size}")
    // the distributed argmax kernel agrees with the local replay on
    // the fixture texts (same buckets, same integer mean, same
    // strictly-greater alphabetical tie-break)
    val preds = LangIdModel.TrainingFixture.map(_._2).toDF("text")
      .select(LangIdModel.predict(col("text")).getField("lang").as("p"))
      .as[String].collect().toSeq
    assert(preds == LangIdModel.TrainingFixture.map(_._1),
      s"kernel predictions diverge: $preds")
  }

  test("learned language-ID: fused single-walk scores are bit-equal to the per-head kernel") {
    import graft.functions.LangIdModel
    // fixture rows + the edge cases the half-away mean guards: empty
    // text, sub-3-gram text (n <= 0 → bias alone), and a 1-gram text
    val texts = LangIdModel.TrainingFixture.map(_._2) ++
      Seq("", "ab", "abc", "the quick brown fox")
    val df = texts.toDF("text")
    val perHead = LangIdModel.scoresMicro(col("text")).map(_._2)
    val rows = df.select(
        array(perHead: _*).as("ref"),
        LangIdModel.scoresMicroFused(col("text")).as("fused"))
    val bad = rows.filter(not(col("ref") === col("fused"))).count()
    assert(bad == 0, s"$bad rows diverge between fused and per-head scoring")
  }

  test("PII redaction: pattern hits and the email→phone→IP order contract") {
    import graft.functions.PiiFunctions._
    val cases = Seq(
      // email whose domain is a dotted quad + alpha TLD: ONE [EMAIL],
      // never an [IP] inside a mangled address (order contract)
      // (raw counts are per-pattern over the ORIGINAL text, so the
      // dotted quad inside the address still counts one raw IP hit)
      ("mail a@111.222.33.44.org now", "mail [EMAIL] now", 1, 0, 1),
      // phone-shaped local part: email wins before the phone pass
      ("555-010-1234@x.com", "[EMAIL]", 1, 1, 0),
      ("call +1 555-010-9999 or 555 123 4567", "call +1 [PHONE] or [PHONE]", 0, 2, 0),
      ("host 10.0.0.1 and 255.255.255.0", "host [IP] and [IP]", 0, 0, 2),
      // no word boundary inside longer digit runs: not an IP
      ("version 1.2.3.4567 stays", "version 1.2.3.4567 stays", 0, 0, 0),
      // …and not a phone either (review r17: the \b guards keep the
      // pattern from eating the middle of a longer reference number)
      ("ref 2555-010-12345 stays", "ref 2555-010-12345 stays", 0, 0, 0),
      ("clean text stays clean", "clean text stays clean", 0, 0, 0))
    val out = cases.map(_._1).toDF("t")
      .select(redact(col("t")).as("r"),
        emailCount(col("t")).cast("int").as("e"),
        phoneCount(col("t")).cast("int").as("p"),
        ipv4Count(col("t")).cast("int").as("i"))
      .as[(String, Int, Int, Int)].collect().toSeq
    assert(out == cases.map(c => (c._2, c._3, c._4, c._5)), s"got $out")
  }

  test("stripHtml: script/style subtrees vanish whole, entities decode once, tags collapse") {
    import graft.functions.WebFunctions.stripHtml
    val cases = Seq(
      ("<p>plain <b>bold</b></p>", "plain bold"),
      // script content (with a bare '<' inside) must vanish as a BLOCK
      ("a<script>if (1 < 2) alert('x');</script>b", "a b"),
      ("a<STYLE type=\"x\">p { }</STYLE>b", "a b"),
      // multi-line lazy span: two scripts, text between survives
      ("<script>x\ny</script>keep<script>z</script>", "keep"),
      // &amp;lt; decodes ONCE to the literal &lt; — never to '<'
      ("1 &lt; 2 &amp;lt; 3 &quot;q&quot; &#39;s&#39; a&nbsp;b", "1 < 2 &lt; 3 \"q\" 's' a b"),
      ("  lots   of\n\n space  ", "lots of space"))
    val out = cases.map(_._1).toDF("h")
      .select(stripHtml(col("h")).as("t")).as[String].collect().toSeq
    assert(out == cases.map(_._2), s"got $out")
  }

  test("urlDomain PSL arm: longest suffix wins, fall-through, rule fallback") {
    import graft.functions.WebFunctions._
    val cases = Seq(
      // multi-label suffix: co.uk beats the 1-label uk rule
      ("https://WWW.shop.Example.co.UK/x", "example.co.uk", "co.uk"),
      // 1-label suffix, 2-label host
      ("http://site.io/a", "site.io", "site.io"),
      // deeper host under a 1-label suffix: registrable = label+suffix
      ("https://a.b.example.com", "example.com", "example.com"),
      // host equal to a 2-label suffix: falls through to the uk rule
      ("http://co.uk/", "co.uk", "co.uk"),
      // no suffix matches -> plain last-two-labels rule
      ("http://x.y.internal/", "y.internal", "y.internal"),
      // port + fragment stripped before matching
      ("http://blog.Uni.AC.uk:80/p#f", "uni.ac.uk", "ac.uk"),
      ("not a url", "", ""))
    val out = cases.map(_._1).toDF("url")
      .select(urlDomain(col("url"), PslFixture).as("p"),
        urlDomain(col("url")).as("r"))
      .as[(String, String)].collect().toSeq
    assert(out == cases.map(c => (c._2, c._3)), s"got $out")
  }

  test("pageRankMicro: hand-computed 3-node graph, exact integer ranks") {
    import graft.functions.GraphFunctions.pageRankMicro
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    def ranks(iters: Int): Map[Long, Long] =
      pageRankMicro(nodes, edges, iters, dampPct = 85)
        .as[(Long, Long)].collect().toMap
    // iter 1: contribs n1<-1000000, n2<-500000, n3<-1500000;
    // rank = 150000 + (85*s) DIV 100
    assert(ranks(1) == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    // iter 2: n1<-1425000, n2<-500000, n3<-575000+500000
    assert(ranks(2) == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
    // a sink-free cycle conserves integer mass up to floor loss:
    // total <= 3x10^6 and strictly positive everywhere
    val r5 = ranks(5)
    assert(r5.values.sum <= 3000000L && r5.values.forall(_ > 0))
    // no in-links -> pure base rank
    val lonely = pageRankMicro(Seq(7L, 8L).toDF("id"),
        Seq((7L, 8L)).toDF("src", "dst"), iters = 3, dampPct = 85)
      .as[(Long, Long)].collect().toMap
    assert(lonely(7L) == 150000L)
  }

  test("keywordCounts: the Aho-Corasick fixtures — dict suffixes, overlap, UTF-8 reset") {
    import graft.expressions.KeywordExpressions.keywordCounts
    def run(text: String, pats: Seq[String]): Seq[Int] =
      Seq(text).toDF("t").select(keywordCounts(col("t"), pats).as("c"))
        .as[Seq[Int]].collect().head
    // the 1975 paper's own fixture: "ushers" fires she, he (inside
    // she via fail link), hers — his never
    assert(run("ushers", Seq("he", "she", "his", "hers")) == Seq(1, 1, 0, 1))
    // overlapping occurrences all count: aa in aaaa -> 3; aaa -> 2
    assert(run("aaaa", Seq("aa", "aaa")) == Seq(3, 2))
    // a pattern that is a proper substring of another fires on both
    // paths (an ends inside scan AND standalone)
    assert(run("scan an", Seq("scan", "can", "an")) == Seq(1, 1, 2))
    // cross-word pattern spans the space
    assert(run("batch batch batch", Seq("batch batch")) == Seq(2))
    // multi-byte UTF-8 resets the automaton and never falsely matches
    assert(run("scän scan", Seq("scan", "an")) == Seq(1, 1))
    // empty text and no-match text
    assert(run("", Seq("x")) == Seq(0))
    assert(run("zzz", Seq("x", "y")) == Seq(0, 0))
    // contract guards: empty/duplicate/non-ASCII patterns refused
    for (bad <- Seq(Seq(""), Seq("a", "a"), Seq("scän"), Seq.empty[String]))
      intercept[Exception](run("t", bad))
  }

  test("dsir gram stream: HOF form ≡ the windowed reference multiset (optimization r18)") {
    import org.apache.spark.sql.functions._
    // edge shapes: single token, doubled spaces (empty tokens are real
    // occurrences in the multinomial stream), trailing space, unicode
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "x  y"),
      (4L, "tail "), (5L, "ü v ü")).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val hof = docs.select(col("doc_id"), explode(concat(toks,
        zip_with(slice(toks, lit(1), nTok - 1), slice(toks, lit(2), nTok - 1),
          (a, b) => concat_ws(" ", a, b)))).as("__g"))
      .groupBy("doc_id", "__g").count()
      .as[(Long, String, Long)].collect().toSet
    val ref = docs.select(col("doc_id"),
        posexplode(toks).as(Seq("__pos", "__w")))
      .withColumn("__w2", lead("__w", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("__pos")))
      .select(col("doc_id"), explode(when(col("__w2").isNotNull,
          array(col("__w"), concat_ws(" ", col("__w"), col("__w2"))))
        .otherwise(array(col("__w")))).as("__g"))
      .groupBy("doc_id", "__g").count()
      .as[(Long, String, Long)].collect().toSet
    assert(hof == ref)
  }
}
