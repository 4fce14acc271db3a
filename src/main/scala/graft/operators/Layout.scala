package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * normalized key columns so that rows close in BOTH dimensions land
  * in the same parquet row groups — then ANY 2-D box predicate skips
  * most of the file via row-group min/max stats, where a linear sort
  * only helps its leading column.
  *
  * This is the multi-dimensional data-skipping strategy production
  * lakehouse layouts use for 100 TB fact tables (the OPTIMIZE ZORDER
  * pattern): layout is a one-time write-side cost — one range
  * repartition + in-partition sort on the z-value, both ∝ corpus —
  * and every subsequent selective scan pays only for the row groups
  * whose [min, max] z-interval intersects the predicate's ranks.
  * The z-value itself is pure codegen'd bit math (shift/and/or
  * terms), no UDF anywhere.
  *
  * Rank normalization: bit interleaving assumes the two inputs use
  * their low `bits` uniformly, so raw skewed keys are first mapped to
  * their quantile rank on a [0, 2^bits) scale. The rank table is one
  * small ordered aggregation per column (`approx`-free: exact
  * distinct-value histogram like qualityDeciles, bounded by value
  * cardinality, not corpus size); here we normalize affinely from
  * [min, max], which is exact for the uniform-ish TPC-H keys and
  * keeps the oracle trivial.
  */
object Layout {

  /** Morton z-value of two long columns already scaled to [0, 2^bits):
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** k-column generalization: bit i of column j lands at position
    * i·k + j (round-robin interleave — the layout OPTIMIZE ZORDER
    * applies to arbitrarily many clustering columns). k·bits ≤ 62. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1 && bits >= 1 && k * bits <= 62,
      s"need k*bits <= 62, got $k * $bits")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Affine [lo, hi] → [0, 2^bits) scaling (exact long math).
    *
    * Out-of-range keys are clamped to [lo, hi] — an unclamped value
    * below lo would go negative and its sign-extended bits would
    * corrupt the Morton interleave silently (layout quality, not
    * correctness — but silent). The scale multiply is guarded against
    * long overflow (range width must fit 63−bits bits), and the
    * division is integral (`div`), not double `/` — a double quotient
    * loses exactness past 2^53. The clamped product is < 2^63 and the
    * quotient provably < 2^bits, so no output cap is needed. */
  def scaleTo(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi >= lo, s"empty range [$lo, $hi]")
    // bits >= 63 would wrap the Java shift (mod 64) and silently
    // mis-scale; 62 is the widest the overflow guard below can hold
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    require(hi - lo >= 0 && hi - lo <= (Long.MaxValue >> bits),
      s"range width ${hi} - ${lo} overflows the $bits-bit scale multiply")
    val cc = least(lit(hi), greatest(lit(lo), c))
    call_function("div", (cc - lit(lo)) * lit(1L << bits), lit(hi - lo + 1))
  }

  /** Min/max of a long/int column read from parquet FOOTER statistics
    * (driver-side metadata IO, no Spark job): the z-order domain for
    * [[zorderWrite]] without the two full-corpus `max()` scans q34
    * first shipped with — at 100 TB those were two extra table reads
    * before the layout write. Folds row-group stats across every
    * file of a parquet directory. */
  def parquetLongRange(spark: org.apache.spark.sql.SparkSession,
                       path: String, column: String): (Long, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      else Array(root)
    var lo = Long.MaxValue
    var hi = Long.MinValue
    files.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.forEach { block =>
          block.getColumns.forEach { c =>
            if (c.getPath.toDotString == column) c.getStatistics match {
              case s: org.apache.parquet.column.statistics.LongStatistics
                  if s.hasNonNullValue =>
                lo = math.min(lo, s.getMin); hi = math.max(hi, s.getMax)
              case s: org.apache.parquet.column.statistics.IntStatistics
                  if s.hasNonNullValue =>
                lo = math.min(lo, s.getMin.toLong); hi = math.max(hi, s.getMax.toLong)
              case _ => ()
            }
          }
        }
      } finally reader.close()
    }
    require(lo <= hi,
      s"no long/int footer statistics for column '$column' under $path")
    (lo, hi)
  }

  /** Write `df` z-ordered by (`aCol`, `bCol`): range-repartition on
    * the z-value (so files hold disjoint z-ranges), sort within each
    * partition (so row groups within a file hold tight min/max
    * intervals), drop the helper column, write parquet. Both steps
    * are linear in the corpus; nothing is collected. */
  def zorderWrite(df: DataFrame, path: String, aCol: String, bCol: String,
                  aRange: (Long, Long), bRange: (Long, Long),
                  bits: Int, partitions: Int): Unit = {
    val z = zValue(
      scaleTo(col(aCol).cast("long"), aRange._1, aRange._2, bits),
      scaleTo(col(bCol).cast("long"), bRange._1, bRange._2, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
