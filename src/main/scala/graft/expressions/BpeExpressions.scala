package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encode kernel (Sennrich et al. 2016 semantics, the
  * `</w>`-marker variant: a word's initial symbol sequence is its
  * characters plus a final `</w>` symbol).
  *
  * Encoding applies the learned merges IN RANK ORDER, each merge
  * rewriting the symbol sequence left-to-right greedily — exactly the
  * operation [[graft.functions.BpeFunctions.bpeTrain]]'s per-iteration
  * vocabulary rewrite performs, so encoding a training word reproduces
  * its final training symbols bit-for-bit (pinned by BpeSpec). The
  * min-rank-first formulation used by production encoders is the same
  * function (each merge's applicability is unaffected by later-rank
  * merges); rank order is the directly-provable form.
  *
  * The input is a whole space-tokenized text; output is the
  * concatenation of its words' token sequences. Per-partition word
  * memo: corpus word frequencies are Zipfian, so the per-instance
  * cache (bounded, cleared at capacity) turns the per-occurrence cost
  * into a per-distinct-word cost — the same reason the trainer runs
  * on the word-frequency table instead of the corpus.
  */
object BpeExpressions {

  val EndOfWord = "</w>"

  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    // merge list as arrays for tight loops (built once per task instance)
    @transient private lazy val lefts: Array[String] = merges.map(_._1).toArray
    @transient private lazy val rights: Array[String] = merges.map(_._2).toArray
    @transient private lazy val joined: Array[String] =
      merges.map(m => m._1 + m._2).toArray
    // bounded per-instance memo (Zipfian corpora hit it constantly;
    // clear-at-capacity keeps worst-case memory fixed without LRU
    // bookkeeping)
    @transient private lazy val memo =
      new java.util.HashMap[String, Array[UTF8String]]()
    private val MemoCap = 1 << 16

    private def encodeWord(word: String): Array[UTF8String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      var syms = new java.util.ArrayList[String](word.length + 1)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        syms.add(word.substring(i, i + n))
        i += n
      }
      syms.add(EndOfWord)
      var m = 0
      while (m < lefts.length) {
        val l = lefts(m); val r = rights(m); val j = joined(m)
        // left-to-right greedy single-merge pass (skip past a merge so
        // an overlapping occurrence, e.g. (a,a) over "a a a", merges
        // once — the trainer's rewrite does the same)
        var k = 0
        var out: java.util.ArrayList[String] = null
        while (k < syms.size) {
          if (out == null && k + 1 < syms.size &&
              syms.get(k) == l && syms.get(k + 1) == r) {
            out = new java.util.ArrayList[String](syms.size)
            var p = 0
            while (p < k) { out.add(syms.get(p)); p += 1 }
          }
          if (out != null) {
            if (k + 1 < syms.size && syms.get(k) == l && syms.get(k + 1) == r) {
              out.add(j); k += 2
            } else { out.add(syms.get(k)); k += 1 }
          } else k += 1
        }
        if (out != null) syms = out
        m += 1
      }
      val arr = new Array[UTF8String](syms.size)
      var p = 0
      while (p < arr.length) { arr(p) = UTF8String.fromString(syms.get(p)); p += 1 }
      if (memo.size >= MemoCap) memo.clear()
      memo.put(word, arr)
      arr
    }

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val out = new java.util.ArrayList[UTF8String]()
      var from = 0
      var done = false
      while (!done) {
        val sp = text.indexOf(' ', from)
        val word = if (sp < 0) text.substring(from) else text.substring(from, sp)
        val toks = encodeWord(word)
        var p = 0
        while (p < toks.length) { out.add(toks(p)); p += 1 }
        if (sp < 0) done = true else from = sp + 1
      }
      new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
    }

    override protected def withNewChildInternal(c: Expression): BpeEncode =
      copy(child = c)
  }

  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), merges))
}
