package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeFunctions._

/** BPE trainer + encode kernel semantics, pinned on the classic
  * Sennrich corpus (low×5, lower×2, newest×6, widest×3) whose merge
  * sequence is hand-computable: pair counts are per adjacent position
  * × word frequency, argmax ties break (count DESC, left ASC,
  * right ASC), words end in a separate `</w>` symbol. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq(text).toDF("text")
  }

  private lazy val merges = bpeTrain(corpus, "text", numMerges = 10)

  test("the classic corpus learns the hand-computed merge sequence") {
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>"), ("low", "</w>"),
      ("d", "est</w>")))
  }

  test("distributed and collected training paths agree exactly") {
    val dist = bpeTrain(corpus, "text", numMerges = 10, collectVocabMax = 0L)
    assert(dist == merges)
  }

  test("distributed and collected paths agree on random tie-heavy corpora with supplementary-plane symbols (property)") {
    // the r12 bug class: the local trainer's JVM-String pair ordering
    // disagreed with the distributed argmax's UTF8String (byte) order
    // on supplementary-plane symbols. A 3-letter alphabet forces
    // frequent count ties so the tie-break actually decides merges;
    // 𝕏 (U+1D54F, surrogate pair in JVM Strings, 4 UTF-8 bytes) and
    // é (2 bytes) sit in the alphabet to keep the orders distinct.
    val rnd = new scala.util.Random(777)
    val alphabet = Vector("a", "b", "𝕏", "é")
    for (trial <- 1 to 3) {
      val words = Seq.fill(60) {
        (1 to (1 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      }
      val text = words.mkString(" ")
      val docs = Seq(text).toDF("text")
      val local = bpeTrain(docs, "text", numMerges = 8, minPairFreq = 1L)
      val dist = bpeTrain(docs, "text", numMerges = 8, minPairFreq = 1L,
        collectVocabMax = 0L)
      assert(local == dist, s"trial $trial diverged:\nlocal $local\ndist  $dist")
    }
  }

  test("training stops early when no pair reaches minPairFreq") {
    // every word unique, freq 1 → best pair count is 1 < default 2
    val m = bpeTrain(Seq("ab cd ef").toDF("text"), "text", numMerges = 10)
    assert(m == Seq.empty)
  }

  private def encodeOne(word: String): Seq[String] = {
    Seq(word).toDF("t")
      .select(bpeEncode(col("t"), merges).as("toks"))
      .as[Seq[String]].head()
  }

  test("encoding training words applies the merges exactly") {
    assert(encodeOne("low") == Seq("low</w>"))
    assert(encodeOne("lower") == Seq("low", "e", "r", "</w>"))
    assert(encodeOne("newest") == Seq("newest</w>"))
    assert(encodeOne("widest") == Seq("w", "i", "dest</w>"))
  }

  test("an UNSEEN word composes from learned subwords") {
    // lowest: never in the corpus; merges 1-5 + 3 produce low + est</w>
    assert(encodeOne("lowest") == Seq("low", "est</w>"))
  }

  test("whole-text encoding concatenates per-word sequences") {
    val got = Seq("newest low lower").toDF("t")
      .select(bpeEncode(col("t"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(got == Seq("newest</w>", "low</w>", "low", "e", "r", "</w>"))
  }

  test("round-trip: stripping </w> and joining reconstructs the text") {
    val texts = Seq("low lower newest widest lowest",
      "unrelated words entirely", "x", "")
    val got = texts.toDF("t")
      .select(col("t"), bpeEncode(col("t"), merges).as("toks"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (t, toks) =>
      // reconstruct: </w> closes a word, other tokens accumulate
      val words = scala.collection.mutable.ArrayBuffer[String]()
      val sb = new StringBuilder
      toks.foreach { tok =>
        if (tok.endsWith("</w>")) {
          sb.append(tok.dropRight(4)); words += sb.toString; sb.clear()
        } else sb.append(tok)
      }
      if (sb.nonEmpty) words += sb.toString
      assert(words.mkString(" ") == t, s"round-trip failed for '$t'")
    }
  }

  test("empty word encodes to the bare end marker") {
    assert(encodeOne("") == Seq("</w>"))
  }

  test("back-to-back pair occurrences merge greedily left-to-right") {
    // the kernel's single pass skips past each merge, so runs of a
    // pair collapse pairwise from the left — the case the t8b oracle's
    // doubled-delimiter replace chain must also reproduce exactly
    def enc(word: String, ms: Seq[(String, String)]): Seq[String] =
      Seq(word).toDF("t").select(bpeEncode(col("t"), ms).as("toks"))
        .as[Seq[String]].head()
    val ta = Seq("t" -> "a")
    assert(enc("tata", ta) == Seq("ta", "ta", "</w>"))
    assert(enc("tatata", ta) == Seq("ta", "ta", "ta", "</w>"))
    val aa = Seq("a" -> "a")
    assert(enc("aaa", aa) == Seq("aa", "a", "</w>"))
    assert(enc("aaaa", aa) == Seq("aa", "aa", "</w>"))
    assert(enc("aaaaa", aa) == Seq("aa", "aa", "a", "</w>"))
  }

  test("local trainer tie-breaks in UTF8String (code-point) order like the distributed argmax") {
    // one word of two symbols: U+10000 (a surrogate pair, which Java
    // String order ranks BELOW U+E000 because its first UTF-16 unit is
    // 0xD800) followed by U+E000. Both adjacent pairs tie at count 1,
    // so the tie-break decides: code-point order picks left = U+E000
    // (0xE000 < 0x10000); UTF-16 code-unit order would pick U+10000.
    val sup = new String(Character.toChars(0x10000))
    val pri = "\uE000"
    val docs = Seq(sup + pri).toDF("text")
    val ms = bpeTrain(docs, "text", numMerges = 1, minPairFreq = 1L)
    assert(ms == Seq(pri -> "</w>"),
      s"expected U+E000 to win the tie under code-point order, got $ms")
  }
}
