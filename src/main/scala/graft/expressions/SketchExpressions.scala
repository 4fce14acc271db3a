package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable KMV ("k minimum values" / bottom-k theta) distinct-count
  * sketch, the 100-TB answer to `count(DISTINCT x)`.
  *
  * `count(DISTINCT x)` cannot partially aggregate: Spark expands it to
  * a two-phase plan whose first exchange ships every distinct VALUE of
  * every group — at corpus scale the shuffle is data-sized. The sketch
  * aggregate keeps only the k smallest distinct xxhash64 values per
  * group (8k bytes of state, k ≈ 4096 → 32 KB), combines map-side like
  * any algebraic aggregate, and ships one bounded sketch per group per
  * task. Sketches are also a MATERIALIZABLE summary: persist one per
  * shard/day/domain once, then answer distinct-count rollups over any
  * union of them by merging 32 KB blobs — the two-level pattern
  * x31b_sketch_rollup demonstrates (per-nation sketches merged up to
  * regions without re-touching the fact table).
  *
  * Estimator: with u(k) = the k-th smallest hash mapped to [0,1),
  * E = (k-1)/u(k) (Bar-Yossef et al. 2002; Beyer et al. 2007's
  * unbiased form), relative error ≈ 1/sqrt(k-2) (~1.6 % at k=4096).
  * Below k distinct inputs the sketch holds every distinct hash, so
  * the estimate is EXACT (modulo 64-bit collisions, P ≈ k²/2⁶⁵) —
  * which is what lets the gate compare x31/x31b against a DuckDB
  * `count(DISTINCT …)` oracle exactly, while the SketchSpec pins the
  * error bound in the estimating regime at 200k distinct.
  *
  * Merge keeps the k smallest of the union (trimming to the smaller k
  * when widths differ), which is exactly the sketch of the
  * concatenated inputs — merge is associative, commutative and
  * idempotent, so the result is partition- and order-insensitive
  * (SketchSpec pins bit-identical binaries under reordering). NULLs
  * are skipped, matching `count(DISTINCT …)` semantics.
  */
object SketchExpressions {

  private val SEED = 42L
  private val TWO64 = 1.8446744073709552e19 // 2^64 as double

  private val UNSIGNED = new java.util.Comparator[java.lang.Long] {
    override def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compareUnsigned(a, b)
  }

  /** Bounded sorted set of the k smallest distinct hashes (unsigned
    * order). `k = Int.MaxValue` marks a merge buffer that has not yet
    * seen a sketch and adopts the first one's width. */
  final class KmvBuffer(var k: Int) {
    val set = new java.util.TreeSet[java.lang.Long](UNSIGNED)
    def insert(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
        if (set.add(h)) { set.pollLast(); () }
      }
    }
    def trimTo(newK: Int): Unit = {
      if (newK < k) k = newK
      while (set.size > k) set.pollLast()
    }
  }

  /** Wire/eval format: int32 k, int32 n, then n int64 hashes in
    * ascending unsigned order. The aggregate's eval emits the same
    * bytes serialize does, so kmv_merge consumes either. */
  private[graft] def writeBuffer(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.set.size)
    bb.putInt(buf.k)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  /** Folds a serialized sketch into `into` (capacity becomes the
    * min of the two — the sound KMV merge rule) and returns the
    * blob's OWN serialized capacity, so a caller comparing a restored
    * state's k against a requested k sees the mismatch in BOTH
    * directions (after the fold, `into.k` already equals the min and
    * can no longer tell a smaller-than-requested blob apart). */
  private[graft] def readInto(bytes: Array[Byte], into: KmvBuffer): Int = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    var i = 0
    while (i < n) { into.insert(bb.getLong); i += 1 }
    into.trimTo(k)
    k
  }

  private def toUnit(h: Long): Double = {
    val d = h.toDouble
    (if (h < 0) d + TWO64 else d) / TWO64
  }

  /** Hash a JVM string exactly as the aggregate hashes a StringType
    * value — the streaming state op (StreamOps.streamDistinctCounts)
    * must produce sketches interchangeable with batch ones. */
  private[graft] def hashString(s: String): Long =
    XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType, SEED)

  /** (k-1)/u(k) when full, exact n below k; deterministic for a given
    * input multiset. */
  private[graft] def estimate(bytes: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    if (n < k) n.toLong
    else {
      bb.position(8 + 8 * (n - 1))
      math.rint((k - 1).toDouble / toUnit(bb.getLong)).toLong
    }
  }

  /** Aggregate: KMV sketch (binary) of the distinct values of `child`. */
  case class KmvSketchAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {
    require(k >= 16, s"sketch width must be >= 16, got $k")

    override def prettyName: String = "kmv_sketch"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

    override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(XxHash64Function.hash(v, child.dataType, SEED))
      buf
    }

    override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
      val it = other.set.iterator()
      while (it.hasNext) buf.insert(it.next())
      buf
    }

    override def eval(buf: KmvBuffer): Any = writeBuffer(buf)
    override def serialize(buf: KmvBuffer): Array[Byte] = writeBuffer(buf)
    override def deserialize(bytes: Array[Byte]): KmvBuffer = {
      val buf = createAggregationBuffer()
      readInto(bytes, buf)
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
      copy(child = c)
  }

  /** Aggregate: union of already-built sketches (binary → binary).
    * Width adopts the smallest input k; NULL sketches are skipped. */
  case class KmvMergeAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)

    override def prettyName: String = "kmv_merge"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): KmvBuffer =
      new KmvBuffer(Int.MaxValue)

    override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) readInto(v.asInstanceOf[Array[Byte]], buf)
      buf
    }

    override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
      val it = other.set.iterator()
      while (it.hasNext) buf.insert(it.next())
      buf.trimTo(other.k)
      buf
    }

    override def eval(buf: KmvBuffer): Any = writeBuffer(buf)
    override def serialize(buf: KmvBuffer): Array[Byte] = writeBuffer(buf)
    override def deserialize(bytes: Array[Byte]): KmvBuffer = {
      val buf = createAggregationBuffer()
      readInto(bytes, buf)
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KmvMergeAgg =
      copy(child = c)
  }

  /** Scalar: distinct-count estimate of a sketch binary (exact when
    * the sketch never filled). */
  case class KmvEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)
    override def prettyName: String = "kmv_estimate"
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      estimate(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): KmvEstimate =
      copy(child = c)
  }

  private def parse(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong; i += 1 }
    (k, hs)
  }

  /** Scalar pairwise union: same result (bit-identical) as aggregating
    * the two sketches through kmv_merge. */
  case class KmvUnion(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType, BinaryType)
    override def prettyName: String = "kmv_union"
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (ka, ha) = parse(a.asInstanceOf[Array[Byte]])
      val (kb, hb) = parse(b.asInstanceOf[Array[Byte]])
      val buf = new KmvBuffer(math.min(ka, kb))
      var i = 0
      while (i < ha.length) { buf.insert(ha(i)); i += 1 }
      i = 0
      while (i < hb.length) { buf.insert(hb(i)); i += 1 }
      writeBuffer(buf)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvUnion =
      copy(left = l, right = r)
  }

  /** Scalar theta-style intersection-size estimate of two sketches.
    * Both sketches retain every hash below their threshold θ (= 1.0
    * while not full, else the k-th minimum as a fraction of hash
    * space), so hashes common to both below θ = min(θa, θb) are a
    * uniform sample of the intersection at rate θ: estimate =
    * |common < θ| / θ. When NEITHER sketch ever filled, θ = 1 and the
    * count is the EXACT intersection cardinality — the regime the x32
    * oracle runs in. The merge walk over the two sorted arrays is
    * O(|a| + |b|), no allocation. */
  case class KmvIntersect(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType, BinaryType)
    override def prettyName: String = "kmv_intersect"
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (ka, ha) = parse(a.asInstanceOf[Array[Byte]])
      val (kb, hb) = parse(b.asInstanceOf[Array[Byte]])
      // θ as the k-th smallest (sorted ascending: last kept) when full
      val thetaA = if (ha.length >= ka) toUnit(ha(ha.length - 1)) else 1.0
      val thetaB = if (hb.length >= kb) toUnit(hb(hb.length - 1)) else 1.0
      val theta = math.min(thetaA, thetaB)
      var i = 0; var j = 0; var common = 0L
      while (i < ha.length && j < hb.length) {
        val c = java.lang.Long.compareUnsigned(ha(i), hb(j))
        if (c == 0) {
          if (toUnit(ha(i)) < theta || theta == 1.0) common += 1
          i += 1; j += 1
        } else if (c < 0) i += 1 else j += 1
      }
      if (theta == 1.0) common else math.rint(common / theta).toLong
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvIntersect =
      copy(left = l, right = r)
  }

  def kmv_sketch(col: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(col), k).toAggregateExpression())

  def kmv_merge(sketch: Column): Column =
    ColumnBridge.column(
      KmvMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  def kmv_estimate(sketch: Column): Column =
    ColumnBridge.column(KmvEstimate(ColumnBridge.expression(sketch)))

  def kmv_union(a: Column, b: Column): Column =
    ColumnBridge.column(
      KmvUnion(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def kmv_intersect(a: Column, b: Column): Column =
    ColumnBridge.column(
      KmvIntersect(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
