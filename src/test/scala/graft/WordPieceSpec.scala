package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WordPieceFunctions._
import graft.expressions.WordPieceExpressions

class WordPieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def toDocs(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("trainer: likelihood scoring prefers coherent pairs over frequent ones") {
    // 'qz' appears only inside 'qzqz' words (coherent: count(qz-pair) ==
    // count(q)·count(z) up to scale); 'aa' is frequent but its units are
    // everywhere. With scores, (q, ##z) must merge before any 'a' pair.
    val docs = toDocs(Seq(
      "qz qz qz aax aay aaz aaw",
      "qz aax aay aaz aaw aav aau"))
    val merges = wordpieceTrain(docs, "text", numMerges = 1, minPairFreq = 2)
    assert(merges == Seq(("q", "##z")))
  }

  test("trainer: local and distributed paths agree merge-for-merge") {
    val docs = toDocs(Seq(
      "the order scans the table", "the scan orders the tables",
      "order the scan", "tables scan orders", "the the order"))
    val local = wordpieceTrain(docs, "text", numMerges = 12, minPairFreq = 2)
    val dist = wordpieceTrain(docs, "text", numMerges = 12, minPairFreq = 2,
      collectVocabMax = 0L)
    assert(local == dist)
    assert(local.nonEmpty)
    // the BERT symbol convention: a merge's right side is never
    // word-initial, so it always carries the continuation prefix
    assert(local.forall(_._2.startsWith("##")))
  }

  test("trainer stops early when no pair reaches minPairFreq") {
    val docs = toDocs(Seq("ab cd ef"))
    assert(wordpieceTrain(docs, "text", numMerges = 5, minPairFreq = 2).isEmpty)
  }

  test("encode: greedy longest-match-first, UNK on miss, word-length cap") {
    val vocab = Seq("or", "ord", "order", "o", "r", "d", "##r", "##d",
      "##e", "##er", "##der", "##s")
    val docs = toDocs(Seq(
      "order orders",   // longest-first: [order], [order,##s]
      "oder",           // o + ##der (greedy arbitration mid-word)
      "orx",            // no ##x -> whole word UNK
      "",               // empty text -> no tokens
      "a  b"))          // double space: empty word skipped; a,b -> UNK
    val out = docs
      .select(col("doc_id"),
        WordPieceExpressions.wordpiece_encode(col("text"), vocab,
          unk = "[UNK]", maxWordChars = 24).as("t"))
      .orderBy("doc_id")
      .collect()
      .map(r => r.getSeq[String](1).toList)
    assert(out(0) == List("order", "order", "##s"))
    assert(out(1) == List("o", "##der"))
    assert(out(2) == List("[UNK]"))
    assert(out(3) == Nil)
    assert(out(4) == List("[UNK]", "[UNK]"))
    // cap: 'orders' is 6 code points > maxWordChars=5 -> UNK
    val capped = toDocs(Seq("orders"))
      .select(WordPieceExpressions.wordpiece_encode(col("text"), vocab,
        unk = "[UNK]", maxWordChars = 5).as("t"))
      .collect()(0).getSeq[String](0).toList
    assert(capped == List("[UNK]"))
  }

  test("property: kernel equals an independent local greedy walk on random corpora") {
    // reference implementation written independently of the kernel:
    // longest-match at each position against the raw vocab partition
    def refEncode(word: String, vocab: Seq[String], maxChars: Int): List[String] = {
      if (word.length > maxChars) return List("[UNK]")
      val init = vocab.filter(!_.startsWith("##")).sortBy(-_.length)
      val cont = vocab.filter(_.startsWith("##")).map(_.substring(2)).sortBy(-_.length)
      val out = scala.collection.mutable.ListBuffer[String]()
      var pos = 0
      while (pos < word.length) {
        val cands = if (pos == 0) init else cont
        cands.find(p => word.startsWith(p, pos)) match {
          case Some(p) =>
            out += (if (pos == 0) p else "##" + p)
            pos += p.length
          case None => return List("[UNK]")
        }
      }
      out.toList
    }
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcd"
      def piece(maxLen: Int) =
        Seq.fill(1 + rnd.nextInt(maxLen))(alpha(rnd.nextInt(alpha.length))).mkString
      // singles for only PART of the alphabet ('d' missing) so UNK
      // genuinely occurs; random multi-char pieces in both forms
      val vocab = (Seq("a", "b", "c", "##a", "##b", "##c") ++
        Seq.fill(10)(piece(4)) ++ Seq.fill(10)("##" + piece(4))).distinct
      val words = Seq.fill(60)(piece(8))
      val docs = toDocs(words.grouped(6).map(_.mkString(" ")).toSeq)
      val got = docs
        .select(col("doc_id"),
          WordPieceExpressions.wordpiece_encode(col("text"), vocab,
            unk = "[UNK]", maxWordChars = 6).as("t"))
        .orderBy("doc_id")
        .collect().toList.flatMap(_.getSeq[String](1))
      val want = words.flatMap(w => refEncode(w, vocab, maxChars = 6))
      assert(got == want, s"seed $seed: kernel disagrees with reference")
    }
  }

  test("train -> encode: merge-closed vocab round-trips training words") {
    val docs = toDocs(Seq(
      "banana banana banana bandana", "banana bandana banana"))
    val merges = wordpieceTrain(docs, "text", numMerges = 8, minPairFreq = 2)
    assert(merges.nonEmpty)
    // vocab = initial units of the corpus + every merge product: with
    // all single-character units present, greedy encode can always
    // fall back to characters, so every training word round-trips
    // (concatenating its tokens minus ## markers restores the word)
    val chars = "bandana".toSet ++ "banana".toSet
    val initial = chars.map(_.toString).toSeq ++
      chars.map(c => s"##$c").toSeq
    val vocab = vocabFromMerges(initial, merges)
    val out = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct()
      .select(col("w"),
        WordPieceExpressions.wordpiece_encode(col("w"), vocab).as("t"))
      .collect()
    out.foreach { r =>
      val w = r.getString(0)
      val toks = r.getSeq[String](1).toList
      assert(toks.nonEmpty && !toks.contains("[UNK]"))
      assert(toks.map(_.stripPrefix("##")).mkString == w,
        s"round-trip failed for '$w': $toks")
      assert(toks.tail.forall(_.startsWith("##")) &&
        !toks.head.startsWith("##"))
    }
  }

  test("wordpieceDecode: exact inverse on covered text; [UNK] is the only loss and is per-word") {
    import spark.implicits._
    val vocab = "abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
      "abcdefghijklmnopqrstuvwxyz".map(c => s"##$c") ++ Seq("th", "##er")
    val docs = Seq(
      (1L, "the quick brown fox"),          // fully covered → lossless
      (2L, "over x7z lazy"),                // '7' uncovered → that WORD is [UNK]
      (3L, "42 99"),                        // nothing covered
      (4L, ""))                             // empty doc
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        wordpieceDecode(wordpieceEncode(col("text"), vocab)).as("dec"),
        array_contains(wordpieceEncode(col("text"), vocab), "[UNK]").as("unk"))
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // fully covered → exact inverse, no unk
    assert(out(1L) == (("the quick brown fox", false)))
    // the uncovered word — and ONLY it — collapses to the unk token;
    // covered neighbors survive byte-exact
    assert(out(2L) == (("over [UNK] lazy", true)))
    assert(out(3L) == (("[UNK] [UNK]", true)))
    assert(out(4L) == (("", false)))
  }
}
