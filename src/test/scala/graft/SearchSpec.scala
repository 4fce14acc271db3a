package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SearchFunctions.bm25TopK

/** Hand-computed BM25 fixtures (the sf0.01 oracle pins x23 at corpus
  * scale; these pin the scoring semantics on a 4-doc corpus). */
class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // mirror of the production micro computation: one term's
  // contribution for (tf, dl) given (n, avgdl, df), k1=1.2, b=0.75
  private def micro(tf: Long, dl: Long, n: Double, avgdl: Double,
                    df: Double): Long = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val tfn = (tf.toDouble * (1.2 + 1.0)) /
      (tf.toDouble + 1.2 * ((1.0 - 0.75) + 0.75 * dl.toDouble / avgdl))
    math.round(idf * tfn * 1e6)
  }

  private val docs = Seq(
    (1L, "a b a"), (2L, "a c"), (3L, "b b b c"), (4L, "c"))
    .toDF("doc_id", "text")

  test("bm25TopK matches hand-computed Okapi scores and total order") {
    // N=4, dl = 3,2,4,1, avgdl = 2.5; df(a)=2, df(b)=2
    val out = bm25TopK(docs, "doc_id", "text", Seq((0, "a b")), k = 4)
      .orderBy("rank")
      .as[(Int, Int, Long, Double, Long)].collect()
    val m1 = micro(2, 3, 4.0, 2.5, 2.0) + micro(1, 3, 4.0, 2.5, 2.0) // doc1: a×2 + b×1
    val m2 = micro(1, 2, 4.0, 2.5, 2.0)                              // doc2: a×1
    val m3 = micro(3, 4, 4.0, 2.5, 2.0)                              // doc3: b×3
    val exp = Seq((1L, m1, 2L), (2L, m2, 1L), (3L, m3, 1L))
      .sortBy { case (id, m, _) => (-m, id) }
      .zipWithIndex.map { case ((id, m, th), i) =>
        (0, i + 1, id, BigDecimal(m.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, th)
      }
    assert(out.toSeq == exp)     // doc4 has no query term → absent
  }

  test("duplicate query terms count once; unknown terms drop; empty query → no rows") {
    val dup = bm25TopK(docs, "doc_id", "text", Seq((0, "a a b")), k = 4)
      .as[(Int, Int, Long, Double, Long)].collect()
    val single = bm25TopK(docs, "doc_id", "text", Seq((0, "a b")), k = 4)
      .as[(Int, Int, Long, Double, Long)].collect()
    assert(dup.sortBy(_._2).toSeq == single.sortBy(_._2).toSeq)

    // 'zzz' has no postings: scoring proceeds on 'a' alone, and the
    // absent term neither errors nor perturbs df of the present one
    val partial = bm25TopK(docs, "doc_id", "text", Seq((1, "zzz a")), k = 4)
      .as[(Int, Int, Long, Double, Long)].collect().sortBy(_._2)
    assert(partial.map(_._3).toSeq == Seq(1L, 2L)) // tf=2 beats the shorter doc
    assert(partial.forall(_._5 == 1L))

    assert(bm25TopK(docs, "doc_id", "text", Seq((2, "zzz")), k = 4).count() == 0)
  }

  test("k bounds the result per query independently") {
    val out = bm25TopK(docs, "doc_id", "text",
      Seq((0, "a b"), (1, "c")), k = 2)
      .as[(Int, Int, Long, Double, Long)].collect()
    assert(out.count(_._1 == 0) == 2 && out.count(_._1 == 1) == 2)
    assert(out.filter(_._1 == 1).map(_._2).sorted.toSeq == Seq(1, 2))
  }
  test("hybridRrfTopK fuses lexical and dense ranks with exact RRF micros") {
    import graft.functions.SearchFunctions.hybridRrfTopK
    // 4 docs; embeddings chosen so cosine-to-anchor(1) ranks 1,2,3,4
    // descending: anchor (1,0), then (0.9,0.1), (0.5,0.5), (0,1)
    val embeds = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.5f, 0.5f)), (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = hybridRrfTopK(docs, "doc_id", "text", embeds, "vec_id",
        "embedding", Seq((0, "a b", 1L)), k = 4, rrfK = 60, fuseN = 4)
      .orderBy("rank")
      .select("rank", "doc_id", "rrf", "lex_rank", "dense_rank")
      .as[(Int, Long, Double, Int, Int)].collect()
    // dense order: 1, 2, 3, 4 (cosine 1 > .994 > .707 > 0)
    assert(out.map(r => r._2 -> r._5).toMap == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
    // lexical ranks come from bm25TopK; doc 4 ("c") matches no term -> 0
    assert(out.find(_._2 == 4L).get._4 == 0)
    // rrf is exactly the micro-sum of its own rank columns
    def t(r: Int): Long = if (r == 0) 0L else math.round(1e6 / (60.0 + r))
    out.foreach { case (_, _, rrf, lr, dr) =>
      assert(rrf == (t(lr) + t(dr)) / 1e6)
    }
    // fused order is total: micro desc, doc_id asc
    val micros = out.map { case (_, _, _, lr, dr) => t(lr) + t(dr) }
    assert(micros.sameElements(micros.sortBy(-_)))
  }


  test("hybridNormTopK: minmax and zscore modes pin the documented conventions") {
    import graft.functions.SearchFunctions.hybridNormTopK
    val embeds = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.5f, 0.5f)), (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = hybridNormTopK(docs, "doc_id", "text", embeds, "vec_id",
        "embedding", Seq((0, "a b", 1L)), k = 4, fuseN = 4)
      .select("mode", "rank", "doc_id", "fused", "lex_rank", "dense_rank")
      .as[(String, Int, Long, Double, Int, Int)].collect()
    val mm = out.filter(_._1 == "minmax").sortBy(_._2)
    val zs = out.filter(_._1 == "zscore").sortBy(_._2)
    assert(mm.length == 4 && zs.length == 4)

    // reproduce the fusion from first principles: lexical micros from
    // the bm25 fixture, dense micros from the embedding cosines
    val m1 = micro(2, 3, 4.0, 2.5, 2.0) + micro(1, 3, 4.0, 2.5, 2.0)
    val m2 = micro(1, 2, 4.0, 2.5, 2.0)
    val m3 = micro(3, 4, 4.0, 2.5, 2.0)
    val lex = Map(1L -> m1, 2L -> m2, 3L -> m3)           // doc 4 absent
    def cosMicro(x: Double, y: Double): Long =
      math.round(1e6 * (x * 1.0 + y * 0.0) / (math.sqrt(x * x + y * y) * 1.0))
    val den = Map(1L -> cosMicro(1.0, 0.0), 2L -> cosMicro(0.9f.toDouble, 0.1f.toDouble),
      3L -> cosMicro(0.5, 0.5), 4L -> cosMicro(0.0, 1.0))
    def minmaxN(m: Map[Long, Long])(id: Long): Double =
      m.get(id).map(v => (v - m.values.min).toDouble / (m.values.max - m.values.min).toDouble).getOrElse(0.0)
    def zN(m: Map[Long, Long])(id: Long): Double = m.get(id).map { v =>
      val n = m.size.toDouble
      val sm = m.values.sum
      val sq = m.values.map(x => x * x).sum
      val std = math.sqrt(math.max((sq.toDouble - sm.toDouble * sm.toDouble / n) / n, 0.0))
      (v.toDouble - sm.toDouble / n) / std
    }.getOrElse(0.0)
    def fuse(nl: Double, nd: Double): Long = math.round((0.5 * nl + 0.5 * nd) * 1e6)
    def r6(micro: Long): Double = BigDecimal(micro.toDouble / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    mm.foreach { case (_, _, id, fused, _, _) =>
      assert(fused == r6(fuse(minmaxN(lex)(id), minmaxN(den)(id))), s"minmax doc $id")
    }
    zs.foreach { case (_, _, id, fused, _, _) =>
      assert(fused == r6(fuse(zN(lex)(id), zN(den)(id))), s"zscore doc $id")
    }
    // a doc absent from one list contributes 0 on that side: doc 4 has
    // no lexical match, so its minmax fused score is dense-only
    assert(mm.find(_._3 == 4L).get._5 == 0)
    // ordering is total on (fused micro desc, doc_id asc) within mode
    Seq(mm, zs).foreach { rows =>
      val micros = rows.map(r => math.round(r._4 * 1e6))
      assert(micros.sameElements(micros.sortBy(-_)))
    }
  }

  test("hybridNormTopK: a constant list normalizes to 1.0 (minmax) / 0.0 (zscore)") {
    import graft.functions.SearchFunctions.hybridNormTopK
    // all docs equidistant from the anchor direction -> every dense
    // cosine micro identical -> degenerate dense list
    val embeds = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = hybridNormTopK(docs, "doc_id", "text", embeds, "vec_id",
        "embedding", Seq((0, "zzz a", 1L)), k = 4, fuseN = 4)
      .select("mode", "doc_id", "fused", "lex_rank", "dense_rank")
      .as[(String, Long, Double, Int, Int)].collect()
    // lexical list = docs 1,2 (term 'a'); dense list = all four, constant.
    // minmax: dense side contributes 0.5*1.0 to every doc (constant ->
    // 1.0 by convention) -- doc absent from lex still scores 0.5
    val mm = out.filter(_._1 == "minmax")
    assert(mm.filter(r => r._2 == 3L || r._2 == 4L).forall(_._3 == 0.5))
    // zscore: constant dense list contributes 0.0 everywhere; docs
    // absent from the lexical list fuse to exactly 0
    val zsAbsent = out.filter(r => r._1 == "zscore" && (r._2 == 3L || r._2 == 4L))
    assert(zsAbsent.forall(_._3 == 0.0))
  }

  // local reference of the production micro math: sequential-fold dot
  // (the DoubleDot kernel order), round(cos * 1e6)
  private def cosMicros(a: Seq[Float], b: Seq[Float]): Long = {
    def dot(x: Seq[Double], y: Seq[Double]): Double =
      x.zip(y).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
    math.round(dot(ad, bd) / (math.sqrt(dot(ad, ad)) * math.sqrt(dot(bd, bd))) * 1e6)
  }

  private def refMmr(embeds: Seq[(Long, Seq[Float])], anchor: Long, k: Int,
                     candN: Int, lambdaPct: Long): Seq[(Int, Long, Long)] = {
    val av = embeds.find(_._1 == anchor).get._2
    val cand = embeds.map { case (id, v) => (id, cosMicros(v, av), v) }
      .sortBy { case (id, rel, _) => (-rel, id) }.take(candN)
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Seq[Float])]()
    for (r <- 1 to k) {
      val best = cand.filterNot(c => selected.exists(_._1 == c._1))
        .map { case (id, rel, v) =>
          val maxSim = if (selected.isEmpty) 0L
            else selected.map(s => cosMicros(v, s._2)).max
          (id, lambdaPct * rel - (100 - lambdaPct) * maxSim, v)
        }.minBy { case (id, mmr, _) => (-mmr, id) }
      picked += ((r, best._1, best._2))
      selected += ((best._1, best._3))
    }
    picked.toSeq
  }

  test("mmrRerank matches the reference greedy and demotes a near-duplicate at step 3") {
    import graft.functions.SearchFunctions.mmrRerank
    // With selected = {anchor}, maxSim(d) = cos(d, anchor) = rel(d),
    // so step 2 is ALWAYS pure relevance order — demotion first
    // becomes possible at step 3. Fixture: v2/v3 a near-dup pair at
    // rel ≈ 0.5; v4 less relevant (0.45) but dissimilar to v2 — after
    // {v1, v2}, v3's 0.99996 penalty pushes it below v4.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.5f, 0.866f, 0.0f)),
      (3L, Seq(0.5f, 0.866f, 0.01f)),
      (4L, Seq(0.45f, 0.0f, 0.893f)))
    val out = mmrRerank(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        anchors = Seq((0, 1L)), k = 3, candN = 4)
      .orderBy("rank").select("rank", "doc_id").as[(Int, Long)].collect().toSeq
    val want = refMmr(vecs, anchor = 1L, k = 3, candN = 4, lambdaPct = 70)
      .map(p => (p._1, p._2))
    assert(out == want, s"got $out want $want")
    // the designed demotion: 1 (anchor), 2 (most relevant), then 4 —
    // NOT the near-copy 3, despite rel(3) > rel(4)
    assert(out.map(_._2) == Seq(1L, 2L, 4L), out.toString)
  }

  test("mmrRerank k=1 and k=candN edges; lambda=100 reduces to dense top-k") {
    import graft.functions.SearchFunctions.mmrRerank
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.5f, 0.5f)), (4L, Seq(0.0f, 1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val k1 = mmrRerank(df, "vec_id", "embedding", Seq((0, 1L)), k = 1, candN = 4)
      .select("rank", "doc_id").as[(Int, Long)].collect().toSeq
    assert(k1 == Seq((1, 1L)))
    // λ=100: no diversity penalty — selection order IS (rel desc, id asc)
    val all = mmrRerank(df, "vec_id", "embedding", Seq((0, 1L)),
        k = 4, candN = 4, lambdaPct = 100)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val wantOrder = vecs.map { case (id, v) => (id, cosMicros(v, vecs.head._2)) }
      .sortBy { case (id, rel) => (-rel, id) }.map(_._1)
    assert(all == wantOrder, s"got $all want $wantOrder")
  }

  test("mmrRerank degenerate corpora: 1-doc corpus survives; k > corpus truncates, no error") {
    // ADVICE r16: (a) a 1-candidate query has an empty pair-sim matrix
    // and must still return its candidate (left join, not inner);
    // (b) fewer candidates than k must stop the greedy fold, not hit
    // element_at on an empty array (ANSI error / null rows)
    import graft.functions.SearchFunctions.mmrRerank
    val one = Seq((7L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got1 = mmrRerank(one, "vec_id", "embedding", Seq((0, 7L)), k = 1, candN = 3)
      .select("rank", "doc_id").as[(Int, Long)].collect().toSeq
    assert(got1 == Seq((1, 7L)), s"1-doc corpus vanished: $got1")
    val three = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.8f, 0.2f)),
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got3 = mmrRerank(three, "vec_id", "embedding", Seq((0, 1L)), k = 5, candN = 8)
      .orderBy("rank").select("rank", "doc_id").as[(Int, Long)].collect().toSeq
    assert(got3.length == 3 && got3.map(_._1) == Seq(1, 2, 3), s"got $got3")
    assert(got3.map(_._2).toSet == Set(1L, 2L, 3L), s"got $got3")
  }

  test("token_counts kernel ≡ explode(split)+groupBy reference (optimization r18)") {
    import org.apache.spark.sql.functions._
    val texts = Seq(
      (1L, "a b a"), (2L, "a c"), (3L, "b b b c"), (4L, "c"),
      (5L, "double  spaces  count once"), (6L, " leading and trailing "),
      (7L, ""), (8L, "   "), (9L, "ümlaut tökens ümlaut"))
      .toDF("doc_id", "text")
    val kernel = texts.select(col("doc_id"),
        explode(graft.expressions.ShingleExpressions.token_counts(col("text"))).as("__kv"))
      .select(col("doc_id"), col("__kv.w"), col("__kv.tf"))
      .as[(Long, String, Long)].collect().toSet
    val ref = texts.select(col("doc_id"), explode(split(col("text"), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("doc_id", "__w").agg(count(lit(1)).as("__tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(kernel == ref)
  }
}
