package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the
  * reference's text toolbox tokenizes by whitespace/regex only
  * (text.py); subword tokenization is part of the parity-plus
  * LLM-pipeline surface).
  *
  * Scale shape — the reason industrial BPE trainers are feasible at
  * all: ONE corpus scan builds the word-frequency table (map-side-
  * combined hash agg), and every subsequent iteration runs on that
  * VOCABULARY-sized table (Heaps' law: ~10⁶-10⁷ distinct words for a
  * 100 TB corpus — executor-memory-sized, never corpus-sized). Each
  * iteration is (a) an adjacent-pair frequency agg over the vocab,
  * (b) a 1-row argmax collected to the driver (the merge decision IS
  * driver state — same documented KB-scale boundary as the k-means
  * centroid pull), (c) a vocab rewrite applying the merge, eagerly
  * localCheckpoint'ed so plan depth stays constant across iterations
  * (the nearDupClusters discipline; pass `reliable = true` on a real
  * cluster for fault-tolerant checkpoints).
  *
  * Determinism: the argmax orders by (count DESC, left ASC, right
  * ASC) — a total order, so the learned merge sequence is a pure
  * function of the corpus at any parallelism.
  */
object BpeFunctions {

  import graft.expressions.BpeExpressions

  /** Learn `numMerges` BPE merges from the corpus. Stops early when no
    * adjacent pair reaches `minPairFreq` total occurrences (counting
    * one per adjacent position per word occurrence, the Sennrich
    * get_stats convention). Returns the ordered merge list.
    *
    * Two execution paths, same function (BpeSpec pins their
    * agreement): when the distinct-word count fits
    * `collectVocabMax`, the frequency table is collected and the
    * merge loop runs in memory on the driver — the standard
    * industrial shape (a 10⁶-word dict × 50k merges is seconds of
    * driver CPU; per-iteration Spark jobs would be pure overhead).
    * Above it (web-scale noisy vocabularies), the loop stays
    * distributed: vocab-sized jobs per merge, eagerly checkpointed. */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
               minPairFreq: Long = 2L, reliable: Boolean = false,
               collectVocabMax: Long = 1L << 20): Seq[(String, String)] = {
    require(numMerges >= 1, "numMerges must be positive")
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // persisted before count(): the word-frequency table is the one
    // full-corpus aggregation of the algorithm — without the persist,
    // count() and then collect()/the first ckpt re-ran that scan twice
    val words = docs
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy("__w").agg(count(lit(1)).as("__f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    if (words.count() <= collectVocabMax) {
      val wf = words.collect().map(r => (r.getString(0), r.getLong(1)))
      return bpeTrainLocal(wf, numMerges, minPairFreq)
    }
    // initial symbol sequence: characters + the </w> end marker.
    // split(w, "") yields one element per character.
    var vocab = ckpt(words.select(
      concat(split(col("__w"), ""), array(lit(BpeExpressions.EndOfWord)))
        .as("__sym"),
      col("__f")))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.size < numMerges) {
      val pairs = vocab.filter(size(col("__sym")) >= 2)
        .select(col("__f"), explode(transform(
          sequence(lit(0), size(col("__sym")) - 2),
          j => struct(element_at(col("__sym"), j + 1).as("l"),
            element_at(col("__sym"), j + 2).as("r")))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum("__f").as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairFreq) done = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += ((l, r))
        // left-to-right greedy single-merge rewrite — the fold's
        // accumulator-last check cannot re-merge the joined symbol
        // within the pass (l+r ≠ l since r is nonempty), matching the
        // encode kernel's skip-past-a-merge scan (BpeSpec pins the
        // train/encode agreement)
        val merged = aggregate(col("__sym"),
          array().cast("array<string>"),
          (acc, x) => when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
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
    * bit-identical semantics to the distributed loop: per-position
    * pair counts weighted by word frequency, argmax under
    * (count DESC, left ASC, right ASC), left-to-right greedy
    * single-merge rewrite that skips past each merge. */
  private def bpeTrainLocal(wordFreqs: Array[(String, Long)], numMerges: Int,
                            minPairFreq: Long): Seq[(String, String)] = {
    val syms = wordFreqs.map { case (w, _) =>
      val b = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n)
        i += n
      }
      b += BpeExpressions.EndOfWord
      b
    }
    val freqs = wordFreqs.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.size < numMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var w = 0
      while (w < syms.length) {
        val s = syms(w)
        var i = 0
        while (i + 1 < s.length) {
          counts.merge((s(i), s(i + 1)), freqs(w), (a: Long, b: Long) => a + b)
          i += 1
        }
        w += 1
      }
      var best: (String, String) = null
      var bestC = 0L
      // tie-break in UTF8String (UTF-8 byte = code-point) order — the
      // SAME order the distributed path's `orderBy(col("l"), col("r"))`
      // uses; Java String compareTo (UTF-16 code units) disagrees for
      // supplementary-plane symbols vs U+E000..U+FFFF
      def binLt(a: String, b: String): Boolean =
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
      counts.forEach { (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (binLt(p._1, best._1) ||
              (p._1 == best._1 && binLt(p._2, best._2))))) {
          best = p; bestC = c
        }
      }
      if (best == null || bestC < minPairFreq) done = true
      else {
        merges += best
        val (l, r) = best
        val j = l + r
        w = 0
        while (w < syms.length) {
          val s = syms(w)
          var i = 0
          while (i + 1 < s.length) {
            if (s(i) == l && s(i + 1) == r) {
              s(i) = j
              s.remove(i + 1)
            }
            i += 1
          }
          w += 1
        }
      }
    }
    merges.toSeq
  }

  /** Encode a space-tokenized text column with a learned merge list:
    * array of BPE tokens (each word's sequence ends in a token
    * carrying `</w>`). Native kernel with a per-partition word memo —
    * cost ∝ distinct words per partition, not token occurrences. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    BpeExpressions.bpe_encode(text, merges)
}
