package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries frequent-items sketch — the batch complement
  * to the streaming Space-Saving operator (StreamOps.streamHeavyHitters)
  * and the third member of the materialized-summary family (KMV
  * distinct sketches, now item frequencies): one bounded blob per
  * group/shard, combined map-side, rolled up with `mg_merge` without
  * re-touching the data.
  *
  * A global "top tokens per source" over 100 TB via groupBy(source,
  * token) shuffles the full token-count table; the MG aggregate keeps
  * at most `capacity` counters per group (update: increment if
  * present, insert if room, else decrement ALL — the classic
  * Misra-Gries step amortized via a single offset), ships
  * capacity-bounded state, and merges by counter addition followed by
  * one collapse to the capacity-th largest (Agarwal et al.,
  * "Mergeable Summaries", PODS'12 — merged error stays ≤ N/(capacity+1)).
  *
  * Guarantees: counts NEVER overestimate; undercount ≤ N/(capacity+1);
  * every item with true count > N/(capacity+1) is retained. With
  * distinct(items) ≤ capacity no decrement ever fires and every count
  * is EXACT — the regime the x33 oracle runs in (corpus vocabulary ≪
  * capacity), while FreqSketchSpec pins the overflow-regime bounds.
  *
  * Items are STRINGS (cast upstream if needed) — fixed-type keys keep
  * the wire format trivial: int capacity, int n, then n × (UTF-8 len,
  * bytes, int64 count).
  */
object FreqSketchExpressions {

  final class MgBuffer(var capacity: Int) {
    val counts = new java.util.HashMap[String, Long]()
    /** Classic MG decrement-all, amortized: instead of touching every
      * counter, raise a shared offset and evict counters that fall to
      * it. Effective count of item i = counts(i) - offset… except we
      * store effective counts directly and subtract eagerly at
      * collapse time (collapse is rare: once per overflow). */
    def add(item: String, by: Long): Unit = {
      val cur = counts.get(item)
      if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + by)
      else if (counts.size < capacity) counts.put(item, by)
      else collapse(by)
    }
    /** Arrival on a full table: the classic MG step decrements every
      * counter by min(arrival weight, current minimum), dropping
      * zeros — the arriving item itself is charged the same decrement,
      * so nothing is inserted (update always calls with by = 1, where
      * this is exactly textbook Misra-Gries). */
    private def collapse(by: Long): Unit = {
      var min = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < min) min = v }
      val dec = math.min(by, min)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - dec
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    /** Merge-then-collapse to capacity: add counters, then subtract
      * the (capacity+1)-th largest count from all and drop ≤ 0. */
    def mergeFrom(other: MgBuffer): Unit = {
      if (other.capacity < capacity) capacity = other.capacity
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, cur + e.getValue)
      }
      if (counts.size > capacity) {
        val vals = new Array[Long](counts.size)
        var i = 0
        val vit = counts.values().iterator()
        while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - 1 - capacity) // (capacity+1)-th largest
        val jt = counts.entrySet().iterator()
        while (jt.hasNext) {
          val e = jt.next()
          val nv = e.getValue - cut
          if (nv <= 0L) jt.remove() else e.setValue(nv)
        }
      }
    }
  }

  private def writeBuffer(buf: MgBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  private def readBuffer(bytes: Array[Byte]): MgBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  /** Aggregate: MG sketch (binary) of string-item frequencies. */
  case class MgSketchAgg(child: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    // analysis-time type contract (wrong-typed SQL fails legibly, and
    // numeric items coerce to their string form instead of crashing
    // executors with a ClassCastException)
    override def inputTypes: Seq[DataType] =
      Seq(StringType)

    override def prettyName: String = "mg_sketch"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

    override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
      buf
    }

    override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: MgBuffer): Any = writeBuffer(buf)
    override def serialize(buf: MgBuffer): Array[Byte] = writeBuffer(buf)
    override def deserialize(bytes: Array[Byte]): MgBuffer = readBuffer(bytes)

    override def withNewMutableAggBufferOffset(o: Int): MgSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MgSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MgSketchAgg =
      copy(child = c)
  }

  /** Aggregate: merge of already-built MG sketches (binary → binary),
    * adopting the smallest capacity seen. */
  case class MgMergeAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)

    override def prettyName: String = "mg_merge"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): MgBuffer =
      new MgBuffer(Int.MaxValue)

    override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
      val v = child.eval(input)
      if (v != null) buf.mergeFrom(readBuffer(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: MgBuffer): Any = writeBuffer(buf)
    override def serialize(buf: MgBuffer): Array[Byte] = writeBuffer(buf)
    override def deserialize(bytes: Array[Byte]): MgBuffer = readBuffer(bytes)

    override def withNewMutableAggBufferOffset(o: Int): MgMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MgMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MgMergeAgg =
      copy(child = c)
  }

  /** Scalar: the k most frequent items of a sketch as
    * array<struct<item string, count bigint>>, ordered (count DESC,
    * item ASC) — a total order, so results are deterministic. */
  case class MgTopK(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    require(k >= 1, s"k must be >= 1, got $k")
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)
    override def prettyName: String = "mg_topk"
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("item", StringType, nullable = false),
        StructField("count", LongType, nullable = false))),
      containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val buf = readBuffer(input.asInstanceOf[Array[Byte]])
      val entries = new java.util.ArrayList(buf.counts.entrySet())
      java.util.Collections.sort(entries,
        new java.util.Comparator[java.util.Map.Entry[String, Long]] {
          override def compare(a: java.util.Map.Entry[String, Long],
                               b: java.util.Map.Entry[String, Long]): Int = {
            val c = java.lang.Long.compare(b.getValue, a.getValue)
            if (c != 0) c else a.getKey.compareTo(b.getKey)
          }
        })
      val n = math.min(k, entries.size)
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val e = entries.get(i)
        out(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MgTopK =
      copy(child = c)
  }

  def mg_sketch(items: Column, capacity: Int): Column =
    ColumnBridge.column(
      MgSketchAgg(ColumnBridge.expression(items), capacity)
        .toAggregateExpression())

  def mg_merge(sketch: Column): Column =
    ColumnBridge.column(
      MgMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  def mg_topk(sketch: Column, k: Int): Column =
    ColumnBridge.column(MgTopK(ColumnBridge.expression(sketch), k))
}
