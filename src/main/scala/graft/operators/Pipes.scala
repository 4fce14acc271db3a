package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.frame.Frame

/** The reference's Pipe layer (reference: fireworks/toolbox/pipes.py),
  * re-expressed as lazy DataFrame/Frame transformations. A pipeline of
  * Pipes in the reference is object nesting with recursive dispatch
  * (core/pipe.py:139-190); here it is plain plan composition —
  * Catalyst's tree is the pipeline.
  */
object Pipes {

  /** P1 FunctionPipe (pipes.py:569-582): arbitrary Frame→Frame hook. */
  def function(f: Frame)(fn: DataFrame => DataFrame): Frame =
    Frame.fromIndexed(fn(f.df))

  /** P2 Title2LabelPipe (pipes.py:347-372): constant label column. */
  def title2label(f: Frame, title: String): Frame =
    Frame.fromIndexed(f.df.withColumn("labels", lit(title)))

  /** P4 TensorPipe (pipes.py:584-607): lift scalar columns into
    * float-array "tensor" columns (ArrayType(FloatType) is our tensor
    * encoding, SURVEY §1.4; device placement is a no-op on Spark). */
  def toTensor(f: Frame, cols: String*): Frame =
    Frame.fromIndexed(cols.foldLeft(f.df) { (d, c) =>
      d.withColumn(c, array(col(c).cast("float")))
    })

  /** P4 TensorPipe, matrix-row variant (message.py:1036-1038: a row of
    * a 2-D tensor column is its shape[1:] matrix — e.g. mnist.py:27's
    * 784-float image rows become 28×28): reshape a flat array column
    * into the nested-array 2-D tensor encoding. */
  def toTensor2d(f: Frame, c: String, rows: Int, cols: Int): Frame =
    Frame.fromIndexed(f.df.withColumn(c,
      graft.functions.TensorColumn.reshape2d(col(c).cast("array<float>"), rows, cols)))

  /** O1 ShufflerPipe (pipes.py:440-490), seeded variant: a real
    * cluster shuffle ordered by `rand(seed)`; row identity keeps the
    * result reproducible for a fixed seed and partitioning. */
  def shuffle(f: Frame, seed: Long): Frame = {
    val shuffled = f.df
      .withColumnRenamed(Frame.IDX, "__old")
      .withColumn("__r", rand(seed))
    Frame.fromDF(shuffled, Seq("__r", "__old")).dropCols("__r", "__old")
  }

  /** O1 engine-agnostic deterministic shuffle: permutation defined by
    * md5 of a key expression — reproducible across engines (used by the
    * oracle gate) and free of RNG state. */
  def shuffleByHash(f: Frame, keyCols: Seq[String]): Frame = {
    val key = md5(concat_ws(":", keyCols.map(c => col(c).cast("string")): _*))
    val tagged = f.df.withColumn("__h", key)
    val renum = Frame.fromDF(tagged.drop(Frame.IDX), Seq("__h"))
    renum.dropCols("__h")
  }

  /** O2 BatchingPipe (pipes.py:536-567): assign minibatch ids
    * `floor(_idx / size)` and drop the ragged tail — a pure
    * expression, no shuffle. `n` is the frame length (pass it in to
    * avoid recount). */
  def withBatches(f: Frame, size: Long, n: Long): Frame = {
    val full = (n / size) * size
    Frame.fromIndexed(
      f.df.filter(col(Frame.IDX) < full)
        .withColumn("batch_id", (col(Frame.IDX) / size).cast("long")))
  }

  /** O2 driver-side minibatch iterator (the training-loop sink): streams
    * partitions in `_idx` order and regroups into fixed-size batches. */
  def batchIterator(f: Frame, size: Int): Iterator[Seq[org.apache.spark.sql.Row]] =
    f.iterator.grouped(size).filter(_.size == size)

  /** O3 RepeaterPipe (pipes.py:397-438): iterate the input n times
    * (epoch-major: epoch e of m rows occupies [e*m, (e+1)*m)). Virtual
    * oversampling — `explode` of a literal range, no data copy until
    * execution. */
  def repeat(f: Frame, times: Int, n: Long): Frame = {
    // sequence(0, times-1) counts DOWN for times <= 0 (two epochs with
    // negative _idx instead of an empty Frame) — reject early.
    require(times >= 1, s"repeat: times must be >= 1, got $times")
    val rep = f.df
      .withColumn("__e", explode(sequence(lit(0L), lit(times - 1L))))
      .withColumn(Frame.IDX, col("__e") * lit(n) + col(Frame.IDX))
      .drop("__e")
    Frame.fromIndexed(rep)
  }

  /** O5 IndexMapperPipe (pipes.py:492-534): view through an index
    * bijection — delegated to Frame's gather. */
  def indexMap(f: Frame, mapping: Seq[(Long, Long)]): Frame =
    f.select(mapping.sortBy(_._2).map(_._1))

  /** C1 CachingPipe (pipes.py:206-344): Spark's block manager replaces
    * the hand-rolled caches (SURVEY §2.5). */
  def cached(f: Frame): Frame = f.cache()

  /** P3 LabelerPipe (pipes.py:374-395): string labels → dense ids
    * (alphabetical — engine-reproducible) + one-hot float vector.
    *
    * A genuine broadcast join against the ranked distinct-label table:
    * nothing is collected to the driver and the plan stays O(1) in
    * label cardinality (a when-chain would grow the plan per label and
    * break down for high-cardinality columns). The class count rides
    * along as a broadcast 1-row aggregate, so an empty input yields an
    * empty result instead of throwing. */
  def labeler(df: org.apache.spark.sql.DataFrame, labelCol: String): org.apache.spark.sql.DataFrame = {
    // dense alphabetical ids via the distributed zipWithIndex rank
    // (tokenIndices-style) — no single-partition window even for
    // high-cardinality label columns
    val table = Frame.fromDF(df.select(col(labelCol)).distinct(), Seq(labelCol)).df
      .withColumn("label_id", col(Frame.IDX).cast("int"))
      .drop(Frame.IDX)
    val nLab = table.agg(count(lit(1)).cast("int").as("__nlab"))
    df.join(broadcast(table), Seq(labelCol), "left")
      .crossJoin(broadcast(nLab))
      .withColumn("label_id", coalesce(col("label_id"), lit(-1)).cast("int"))
      .withColumn("onehot",
        graft.functions.TextFunctions.oneHot(col("label_id"), col("__nlab")))
      .drop("__nlab")
  }

  /** U16 oversample (preprocessing.py:42 — a stub in the reference;
    * real here): sample with replacement, renumbered densely. */
  def oversample(f: Frame, fraction: Double, seed: Long): Frame =
    Frame.reindexPreservingOrder(
      f.df.sample(withReplacement = true, fraction, seed))
}
