package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketch — the third leg of the summary family
  * next to KMV (distinct counts) and Misra-Gries (frequencies): the
  * 100-TB answer to `percentile(x, q)`, whose exact plan ships every
  * VALUE of every group through the grouping exchange and buffers it
  * in a per-group array.
  *
  * Structure: a KLL-style ladder of compactors (Karnin, Lang, Liberty,
  * FOCS 2016) with a fixed capacity `k` per level and DETERMINISTIC
  * compaction (sort, promote alternating elements, parity flipped per
  * compaction — no RNG, so a fixed input order reproduces the sketch
  * bit-for-bit). Level i holds items of weight 2^i; total weight is
  * preserved exactly by every compaction, so the sketch's n is always
  * the true input count. Per-group state is ≤ k·levels doubles with
  * levels ≈ log2(n/k) — KBs at any corpus size — and partials combine
  * map-side like any algebraic aggregate.
  *
  * EXACT while n ≤ k: level 0 holds every input, no compaction ever
  * fires, and merge is concatenation — associative, commutative, and
  * (after the canonical serialize-time sort) order-insensitive. In
  * that regime `kll_quantile` reproduces Spark's `percentile` /
  * DuckDB's `quantile_cont` interpolation formula exactly (value at
  * fractional position q·(n−1)) — which is what lets the x40 gate
  * compare against a DuckDB oracle bit-for-bit, the same exact-regime
  * contract as KMV below k and MG below capacity. Beyond k the rank
  * error is O(log(n/k)/k)·n (SketchSpec pins ≤ 2 % at n = 200k,
  * k = 1024); results then depend on the merge tree, as with every
  * compaction-based summary.
  *
  * The two-level rollup (per-shard sketches persisted once, merged by
  * [[kll_merge]] without re-touching the fact table) is demonstrated
  * by x40's nation→region shape, mirroring x31b/x33b.
  */
object QuantileSketchExpressions {

  import scala.collection.mutable.ArrayBuffer

  /** Compactor ladder. `k = Int.MaxValue` marks a merge buffer that
    * has not yet seen a sketch and adopts the first one's width. */
  final class KllBuffer(var k: Int) {
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
    val compacts: ArrayBuffer[Int] = ArrayBuffer(0)

    def totalWeight: Long = {
      var w = 0L
      var i = 0
      while (i < levels.size) { w += levels(i).size.toLong << i; i += 1 }
      w
    }

    def insert(v: Double): Unit = {
      levels(0) += v
      if (levels(0).size > k) compact(0)
    }

    /** Sort level i, promote alternating elements (parity flips per
      * compaction) to level i+1 with doubled weight, keep the one
      * leftover of an odd count at level i. Cascades upward. */
    private def compact(i: Int): Unit = {
      if (i + 1 >= levels.size) { levels += ArrayBuffer.empty; compacts += 0 }
      val sorted = levels(i).sortInPlace()
      val m = sorted.size & ~1
      val off = compacts(i) & 1
      var j = off
      while (j < m) { levels(i + 1) += sorted(j); j += 2 }
      compacts(i) += 1
      val leftover = if (m < sorted.size) Some(sorted(sorted.size - 1)) else None
      levels(i).clear()
      leftover.foreach(levels(i) += _)
      if (levels(i + 1).size > k) compact(i + 1)
    }

    def mergeFrom(other: KllBuffer): Unit = {
      if (k == Int.MaxValue) k = other.k
      else if (other.k != Int.MaxValue) k = math.min(k, other.k)
      var i = 0
      while (i < other.levels.size) {
        while (levels.size <= i) { levels += ArrayBuffer.empty; compacts += 0 }
        levels(i) ++= other.levels(i)
        compacts(i) += other.compacts(i)
        i += 1
      }
      i = 0
      while (i < levels.size) {
        if (levels(i).size > k) compact(i)
        i += 1
      }
    }
  }

  /** Wire/eval format: int32 k, int32 nLevels, then per level
    * (int32 compactions, int32 count, count float64 values). Levels
    * serialize SORTED so the exact-regime binary is canonical —
    * independent of input/merge order (SketchSpec pins it). */
  private[graft] def writeBuffer(buf: KllBuffer): Array[Byte] = {
    var bytes = 8
    buf.levels.foreach(l => bytes += 8 + 8 * l.size)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.k)
    bb.putInt(buf.levels.size)
    var i = 0
    while (i < buf.levels.size) {
      val l = buf.levels(i).sortInPlace()
      bb.putInt(buf.compacts(i))
      bb.putInt(l.size)
      var j = 0
      while (j < l.size) { bb.putDouble(l(j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  private[graft] def readBuffer(bytes: Array[Byte]): KllBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(bb.getInt)
    val nLevels = bb.getInt
    var i = 0
    while (i < nLevels) {
      while (buf.levels.size <= i) { buf.levels += ArrayBuffer.empty; buf.compacts += 0 }
      buf.compacts(i) = bb.getInt
      val n = bb.getInt
      var j = 0
      while (j < n) { buf.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    buf
  }

  /** Continuous-interpolation quantile of a sketch binary: the value
    * at weighted fractional position q·(N−1) — in the exact regime
    * precisely `percentile`/`quantile_cont`. Null for an empty
    * sketch. */
  private[graft] def quantileOf(bytes: Array[Byte], q: Double): Any = {
    val buf = readBuffer(bytes)
    val n = buf.totalWeight
    if (n == 0L) return null
    // weighted (value, weight) pairs sorted by value
    val pairs = ArrayBuffer[(Double, Long)]()
    var i = 0
    while (i < buf.levels.size) {
      buf.levels(i).foreach(v => pairs += ((v, 1L << i)))
      i += 1
    }
    val sorted = pairs.sortBy(_._1)
    val p = q * (n - 1).toDouble
    val lo = math.floor(p).toLong
    val hi = math.min(lo + 1, n - 1)
    def valueAt(pos: Long): Double = {
      var cum = 0L
      var j = 0
      while (j < sorted.size) {
        cum += sorted(j)._2
        if (pos < cum) return sorted(j)._1
        j += 1
      }
      sorted(sorted.size - 1)._1
    }
    val vLo = valueAt(lo)
    val vHi = valueAt(hi)
    vLo + (vHi - vLo) * (p - lo.toDouble)
  }

  /** Aggregate: KLL sketch (binary) of a DOUBLE column. */
  case class KllSketchAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(k >= 16, s"sketch capacity must be >= 16, got $k")

    // numeric inputs coerce to double at analysis time; wrong-typed
    // SQL fails legibly instead of a mid-job ClassCastException
    override def inputTypes: Seq[DataType] =
      Seq(DoubleType)

    override def prettyName: String = "kll_sketch"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

    override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
      buf.mergeFrom(other)
      buf
    }

    override def eval(buf: KllBuffer): Any = writeBuffer(buf)
    override def serialize(buf: KllBuffer): Array[Byte] = writeBuffer(buf)
    override def deserialize(bytes: Array[Byte]): KllBuffer = readBuffer(bytes)

    override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KllSketchAgg =
      copy(child = c)
  }

  /** Aggregate: merge of already-built sketches (binary → binary).
    * Capacity adopts the smallest input k; NULL sketches skipped. */
  case class KllMergeAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)

    override def prettyName: String = "kll_merge"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): KllBuffer = new KllBuffer(Int.MaxValue)

    override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
      val v = child.eval(input)
      if (v != null) buf.mergeFrom(readBuffer(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
      buf.mergeFrom(other)
      buf
    }

    override def eval(buf: KllBuffer): Any = writeBuffer(buf)
    override def serialize(buf: KllBuffer): Array[Byte] = writeBuffer(buf)
    override def deserialize(bytes: Array[Byte]): KllBuffer = readBuffer(bytes)

    override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KllMergeAgg =
      copy(child = c)
  }

  /** Scalar: interpolated quantile of a sketch binary. */
  case class KllQuantile(child: Expression, q: Double)
      extends UnaryExpression with CodegenFallback
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    override def prettyName: String = "kll_quantile"
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      quantileOf(input.asInstanceOf[Array[Byte]], q)
    override protected def withNewChildInternal(c: Expression): KllQuantile =
      copy(child = c)
  }

  /** Scalar: the sketch's exact total input count (weight is preserved
    * by every compaction). */
  case class KllCount(child: Expression)
      extends UnaryExpression with CodegenFallback
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)
    override def prettyName: String = "kll_n"
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      readBuffer(input.asInstanceOf[Array[Byte]]).totalWeight
    override protected def withNewChildInternal(c: Expression): KllCount =
      copy(child = c)
  }

  def kll_sketch(col: Column, k: Int): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(col.cast("double")), k)
        .toAggregateExpression())

  def kll_merge(sketch: Column): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  def kll_quantile(sketch: Column, q: Double): Column =
    ColumnBridge.column(KllQuantile(ColumnBridge.expression(sketch), q))

  def kll_n(sketch: Column): Column =
    ColumnBridge.column(KllCount(ColumnBridge.expression(sketch)))
}
