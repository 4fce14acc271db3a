package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout._

/** Z-order layout: bit-interleave correctness and the data-skipping
  * payoff it exists for (row-group min/max pruning on BOTH box
  * dimensions, vs a linear sort that only helps its leading column).
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits (hand-computed Morton codes)") {
    // a=0b101, b=0b011: even positions take a's bits, odd take b's →
    // 0b011011 = 27; plus the corner cases of the 3-bit lattice
    val rows = Seq((5L, 3L), (0L, 0L), (7L, 7L), (1L, 0L), (0L, 1L))
      .toDF("a", "b")
      .select(zValue(col("a"), col("b"), 3).as("z"))
      .as[Long].collect().toSeq
    assert(rows == Seq(27L, 0L, 63L, 1L, 2L))
  }

  test("zValueN round-robin interleave: 2-column form matches zValue; 3-column quadrant is contiguous") {
    val rows = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
    val r = rows.select(
      zValue(col("a"), col("b"), 3).as("z2"),
      zValueN(Seq(col("a"), col("b")), 3).as("z2n"),
      zValueN(Seq(col("a"), col("b"), col("c")), 3).as("z3"))
      .collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    // a=101, b=011, c=110 → position i*3+j: bits (a0,b0,c0)=(1,1,0) at
    // 0,1,2; (a1,b1,c1)=(0,1,1) at 3,4,5; (a2,b2,c2)=(1,0,1) at 6,7,8
    // → 0b101110011 = 371
    assert(r.getLong(2) == 371L)
    // top-level octant of the 3-D lattice: all (a,b,c < 4) under 3 bits
    // fill exactly z < 64
    val grid = (for { a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L }
      yield (a, b, c)).toDF("a", "b", "c")
      .withColumn("z", zValueN(Seq(col("a"), col("b"), col("c")), 3))
    val oct = grid.filter(col("a") < 4 && col("b") < 4 && col("c") < 4)
      .agg(max("z"), count(lit(1))).collect()(0)
    assert(oct.getLong(0) == 63L && oct.getLong(1) == 64L)
  }

  test("scaleTo clamps out-of-range keys and divides exactly") {
    val r = Seq(-5L, 0L, 10L, 99L).toDF("c")
      .select(scaleTo(col("c"), 0L, 10L, 4).as("s"))
      .as[Long].collect().toSeq
    // below-lo clamps to 0 (an unclamped negative would sign-extend
    // into the Morton interleave); above-hi clamps to the top cell
    assert(r == Seq(0L, 0L, (10L * 16) / 11, (10L * 16) / 11))
    assert(r.forall(v => v >= 0 && v < 16))
    // range width must fit the shift
    intercept[IllegalArgumentException] {
      scaleTo(col("c"), 0L, Long.MaxValue / 2, 16)
    }
    // bits outside [1, 62] would wrap the Java shift (mod 64) and
    // silently mis-scale — rejected at construction
    intercept[IllegalArgumentException] { scaleTo(col("c"), 0L, 10L, 0) }
    intercept[IllegalArgumentException] { scaleTo(col("c"), 0L, 10L, 64) }
  }

  test("parquetLongRange reads footer min/max equal to a full scan") {
    val d = "/root/testdata/sf0.001"
    val (lo, hi) = parquetLongRange(spark, s"$d/lineitem.parquet", "l_orderkey")
    val r = Tables.lineitem(spark, d)
      .agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
    assert((lo, hi) == (r.getLong(0), r.getLong(1)))
  }

  test("zValue is monotone under the box containment the curve guarantees") {
    // within any aligned quadrant, all z-values are contiguous: the
    // top-level quadrant of (a<4, b<4) under 3 bits is exactly z < 16
    val grid = (for { a <- 0L until 8L; b <- 0L until 8L } yield (a, b))
      .toDF("a", "b")
      .withColumn("z", zValue(col("a"), col("b"), 3))
    val inQuad = grid.filter(col("a") < 4 && col("b") < 4)
      .agg(max("z"), count(lit(1))).collect()(0)
    assert(inQuad.getLong(0) == 15L && inQuad.getLong(1) == 16L)
  }

  test("z-ordered layout skips row groups on the trailing dimension; linear sort cannot") {
    val d = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val okMax = li.agg(max("l_orderkey")).collect()(0).getLong(0)
    val pkMax = li.agg(max("l_partkey")).collect()(0).getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
    // linear layout: range-sorted by l_orderkey only (the classic
    // single-column sort), same file count
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/linear")
    zorderWrite(li, s"$tmp/z", "l_orderkey", "l_partkey",
      (1L, okMax), (1L, pkMax), bits = 16, partitions = 16)

    // a narrow filter on the NON-leading dimension: the linear layout
    // scatters l_partkey across every file (no skipping); the z-order
    // layout bounds each file's partkey interval
    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("l_partkey") <= pkMax / 20)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
    }
    val linear = scannedRows(s"$tmp/linear")
    val z = scannedRows(s"$tmp/z")
    // both return identical results; the z layout must scan strictly
    // fewer post-pruning rows (observed ~4x fewer at 16 files)
    assert(z < linear * 6 / 10, s"z=$z linear=$linear")

    // and the layouts hold the same multiset of rows
    val a = spark.read.parquet(s"$tmp/linear")
      .groupBy("l_orderkey", "l_partkey").agg(sum(col("l_quantity").cast("long")).as("q"))
    val b = spark.read.parquet(s"$tmp/z")
      .groupBy("l_orderkey", "l_partkey").agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
