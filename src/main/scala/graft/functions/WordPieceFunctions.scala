package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed WordPiece merge learning (Schuster & Nakajima 2012 —
  * the likelihood-scored sibling of [[BpeFunctions]]: BPE merges the
  * most FREQUENT adjacent pair, WordPiece the pair maximizing
  * count(lr) / (count(l)·count(r)), the unigram-LM likelihood gain
  * of the merge — rare-but-coherent units win over frequent-but-
  * incidental ones. The reference tokenizes by whitespace/regex only
  * (`fireworks/toolbox/text.py`); the trainer triple BPE/unigram/
  * WordPiece is parity-plus LLM-pipeline surface).
  *
  * Scale shape — identical to BPE, and for the same reason: ONE
  * corpus scan builds the word-frequency table, every iteration then
  * runs on that VOCABULARY-sized table (Heaps' law keeps it
  * executor-memory-sized at any corpus size). Per iteration: unit
  * counts + adjacent-pair counts (two vocab-sized aggs), a 1-row
  * argmax to the driver (the documented KB-scale boundary), a vocab
  * rewrite applying the merge, eagerly checkpointed so plan depth
  * stays constant.
  *
  * Symbol convention (BERT): a word's initial sequence is its first
  * code point plain, every later code point `##`-prefixed; merging
  * (l, r) yields l + r-without-`##` (r is never word-initial, so it
  * always carries the prefix; the merged symbol inherits l's form).
  * Texts containing literal `#` can therefore alias the continuation
  * marker — the standard WordPiece ambiguity; both this trainer and
  * the DuckDB replay oracle share one convention, so the gate is
  * exact regardless.
  *
  * Determinism: argmax under (score DESC, count DESC, left ASC,
  * right ASC) — score is the IEEE double cnt/(cu_l·cu_r), computed
  * identically by Spark and DuckDB (exact long→double conversions
  * below 2⁵³, correctly-rounded multiply/divide), so the learned
  * sequence is a pure function of the corpus at any parallelism and
  * replayable move-for-move in SQL. */
object WordPieceFunctions {

  import graft.expressions.WordPieceExpressions

  /** Learn `numMerges` WordPiece merges. Stops early when no adjacent
    * pair reaches `minPairFreq` occurrences. Returns the ordered
    * merge list (left, right) with right `##`-prefixed.
    *
    * Two execution paths, same function (WordPieceSpec pins their
    * agreement): vocab fits `collectVocabMax` → driver loop on the
    * collected table (the industrial shape); above it the loop stays
    * distributed, vocab-sized jobs per merge. */
  def wordpieceTrain(docs: DataFrame, textCol: String, numMerges: Int,
                     minPairFreq: Long = 2L, reliable: Boolean = false,
                     collectVocabMax: Long = 1L << 20): Seq[(String, String)] = {
    require(numMerges >= 1, "numMerges must be positive")
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val words = docs
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy("__w").agg(count(lit(1)).as("__f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (words.count() <= collectVocabMax) {
        val wf = words.collect().map(r => (r.getString(0), r.getLong(1)))
        return wordpieceTrainLocal(wf, numMerges, minPairFreq)
      }
      // initial symbols: first code point plain, rest ##-prefixed
      var vocab = ckpt(words.select(
        transform(split(col("__w"), ""),
          (c, i) => when(i === 0, c).otherwise(concat(lit("##"), c)))
          .as("__sym"),
        col("__f")))
      val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
      var done = false
      while (!done && merges.size < numMerges) {
        val units = vocab
          .select(explode(col("__sym")).as("u"), col("__f"))
          .groupBy("u").agg(sum("__f").as("cu"))
        val pairs = vocab.filter(size(col("__sym")) >= 2)
          .select(col("__f"), explode(transform(
            sequence(lit(0), size(col("__sym")) - 2),
            j => struct(element_at(col("__sym"), j + 1).as("l"),
              element_at(col("__sym"), j + 2).as("r")))).as("__p"))
          .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
          .agg(sum("__f").as("cnt"))
          .filter(col("cnt") >= minPairFreq)
        val top = pairs
          .join(units.select(col("u").as("l"), col("cu").as("cul")), Seq("l"))
          .join(units.select(col("u").as("r"), col("cu").as("cur")), Seq("r"))
          .select(col("l"), col("r"), col("cnt"),
            (col("cnt").cast("double") /
              (col("cul").cast("double") * col("cur").cast("double"))).as("sc"))
          .orderBy(col("sc").desc, col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val l = top(0).getString(0)
          val r = top(0).getString(1)
          merges += ((l, r))
          val j = l + r.stripPrefix("##")
          // left-to-right greedy single-merge rewrite, skip-past — the
          // BpeFunctions fold, with the ##-stripped joined symbol
          val merged = aggregate(col("__sym"),
            array().cast("array<string>"),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(j))))
              .otherwise(concat(acc, array(x))))
          val prev = vocab
          vocab = ckpt(vocab.select(merged.as("__sym"), col("__f")))
          // the new checkpoint is materialized (eager) -- release the
          // parent's blocks instead of accumulating numMerges cached
          // lineages for the run's duration (r15 advice)
          org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(prev)
        }
      }
      merges.toSeq
    } finally words.unpersist(blocking = false)
  }

  /** In-memory merge loop over a collected (word, freq) table —
    * bit-identical semantics to the distributed loop. */
  private def wordpieceTrainLocal(wordFreqs: Array[(String, Long)],
                                  numMerges: Int,
                                  minPairFreq: Long): Seq[(String, String)] = {
    val syms = wordFreqs.map { case (w, _) =>
      val b = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += (if (i == 0) w.substring(i, i + n)
              else "##" + w.substring(i, i + n))
        i += n
      }
      b
    }
    val freqs = wordFreqs.map(_._2)
    def binLt(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.size < numMerges) {
      val unitC = new java.util.HashMap[String, Long]()
      val pairC = new java.util.HashMap[(String, String), Long]()
      var w = 0
      while (w < syms.length) {
        val s = syms(w)
        var i = 0
        while (i < s.length) {
          unitC.merge(s(i), freqs(w), (a: Long, b: Long) => a + b)
          if (i + 1 < s.length)
            pairC.merge((s(i), s(i + 1)), freqs(w), (a: Long, b: Long) => a + b)
          i += 1
        }
        w += 1
      }
      // argmax under (score DESC, cnt DESC, l ASC, r ASC) in UTF8
      // binary order — the distributed orderBy's exact comparator
      var best: (String, String) = null
      var bestC = 0L
      var bestS = 0.0
      pairC.forEach { (p, c) =>
        if (c >= minPairFreq) {
          val s = c.toDouble / (unitC.get(p._1).toDouble * unitC.get(p._2).toDouble)
          if (best == null || s > bestS ||
              (s == bestS && (c > bestC ||
                (c == bestC && (binLt(p._1, best._1) ||
                  (p._1 == best._1 && binLt(p._2, best._2))))))) {
            best = p; bestC = c; bestS = s
          }
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val (l, r) = best
        val j = l + r.stripPrefix("##")
        var w2 = 0
        while (w2 < syms.length) {
          val s = syms(w2)
          var i = 0
          while (i + 1 < s.length) {
            if (s(i) == l && s(i + 1) == r) {
              s(i) = j
              s.remove(i + 1)
            }
            i += 1
          }
          w2 += 1
        }
      }
    }
    merges.toSeq
  }

  /** Greedy longest-match-first encode against a fixed vocabulary —
    * native kernel, see [[WordPieceExpressions.WordPieceEncode]]. */
  def wordpieceEncode(text: Column, vocab: Seq[String],
                      unk: String = "[UNK]",
                      maxWordChars: Int = 200): Column =
    WordPieceExpressions.wordpiece_encode(text, vocab, unk, maxWordChars)

  /** Inverse of [[wordpieceEncode]] for the lossless subset: word
    * heads start a new space-joined word, `##`-continuations append
    * their stripped body. Exact round-trip (`decode(encode(t)) = t`)
    * holds for single-space-separated text whose words all encode
    * without `[UNK]` — an unknown word decodes to the literal unk
    * token, which is the one information loss the encoder has. One
    * declarative fold per row, no exchange. */
  def wordpieceDecode(tokens: Column): Column =
    aggregate(tokens, lit(""), (acc, t) =>
      concat(acc,
        when(substring(t, 1, 2) === "##", t.substr(lit(3), length(t)))
          .otherwise(concat(
            when(length(acc) === 0, lit("")).otherwise(lit(" ")), t))))

  /** The encode vocabulary induced by training: every initial unit
    * that survives in some word's final segmentation plus every
    * merged symbol — i.e. the final symbol inventory. Derived
    * locally from the merge list's closure over the corpus is
    * corpus-dependent; the simple sound form (used by callers that
    * want train→encode without re-scanning) is initial units ∪
    * merge products, which covers every symbol the trainer can
    * produce. */
  def vocabFromMerges(initialUnits: Seq[String],
                      merges: Seq[(String, String)]): Seq[String] =
    (initialUnits ++ merges.map { case (l, r) => l + r.stripPrefix("##") })
      .distinct
}
