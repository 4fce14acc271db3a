package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates (approximate, so spec-checked against exact
  * rather than oracle-hashed): HLL distinct counts and quantile
  * sketches — the cardinality/percentile estimators a 100 TB dedup
  * pipeline sizes itself with. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("HLL approx distinct tokens within 5% of exact") {
    val toks = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("token"))
    val row = toks.agg(
      countDistinct(col("token")).as("exact"),
      approx_count_distinct(col("token"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("quantile sketch brackets the exact median") {
    val li = Tables.lineitem(spark, d)
    val Array(approxMedian) =
      li.stat.approxQuantile("l_quantity", Array(0.5), 0.01)
    val n = li.count()
    val below = li.filter(col("l_quantity") <= approxMedian).count()
    val frac = below.toDouble / n
    assert(frac > 0.45 && frac < 0.56, s"median=$approxMedian frac=$frac")
  }

  // ---- KMV (bottom-k theta) sketch: graft.expressions.SketchExpressions

  import graft.expressions.SketchExpressions._
  import spark.implicits._

  test("KMV is exact below k, across duplicates and nulls") {
    // 500 distinct values, each twice, plus nulls — k=1024 never fills
    val df = ((0L until 500L) ++ (0L until 500L)).toDF("v")
      .unionByName(Seq[Option[Long]](None, None).toDF("v"))
    val est = df.agg(kmv_estimate(kmv_sketch(col("v"), 1024)).as("e"))
      .head().getLong(0)
    assert(est == 500L)
  }

  test("KMV merge of part sketches is bit-identical to the whole-corpus sketch") {
    val whole = (0L until 3000L).toDF("v").coalesce(1)
    val parts = (0L until 3000L).map(v => (v % 7, v)).toDF("g", "v")
    val wholeSk = whole.agg(kmv_sketch(col("v"), 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    val merged = parts.groupBy("g").agg(kmv_sketch(col("v"), 256).as("sk"))
      .agg(kmv_merge(col("sk")).as("sk")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(wholeSk, merged))
    // and partition/order-insensitive: a shuffled layout gives the same bytes
    val shuffled = whole.repartition(13).agg(kmv_sketch(col("v"), 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(wholeSk, shuffled))
  }

  test("KMV estimating regime: 200k distinct at k=1024 within the ~3/sqrt(k) band") {
    val n = 200000L
    val est = (0L until n).toDF("v")
      .agg(kmv_estimate(kmv_sketch(col("v"), 1024)).as("e")).head().getLong(0)
    assert(est != n, "should be estimating, not exact, above k")
    val relErr = math.abs(est - n).toDouble / n
    assert(relErr < 0.10, s"est=$est relErr=$relErr")
  }

  test("KMV intersect/union scalars: exact regime and merge equivalence") {
    val a = (0L until 600L).toDF("v").agg(kmv_sketch(col("v"), 1024).as("ska"))
    val b = (400L until 1000L).toDF("v").agg(kmv_sketch(col("v"), 1024).as("skb"))
    val row = a.crossJoin(b).select(
      kmv_intersect(col("ska"), col("skb")).as("common"),
      kmv_estimate(kmv_union(col("ska"), col("skb"))).as("union"),
      kmv_union(col("ska"), col("skb")).as("u_scalar")).head()
    // neither sketch filled → θ = 1 → exact: |[400,600)| and |[0,1000)|
    assert(row.getAs[Long]("common") == 200L)
    assert(row.getAs[Long]("union") == 1000L)
    // the scalar union is bit-identical to aggregating both through kmv_merge
    val merged = a.select(col("ska").as("sk"))
      .unionByName(b.select(col("skb").as("sk")))
      .agg(kmv_merge(col("sk")).as("sk")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("u_scalar"), merged))
  }

  test("KMV intersect estimating regime: 50k-overlap of two 100k sets at k=1024") {
    val a = (0L until 100000L).toDF("v").agg(kmv_sketch(col("v"), 1024).as("ska"))
    val b = (50000L until 150000L).toDF("v").agg(kmv_sketch(col("v"), 1024).as("skb"))
    val est = a.crossJoin(b)
      .select(kmv_intersect(col("ska"), col("skb")).as("c")).head().getAs[Long]("c")
    val relErr = math.abs(est - 50000L).toDouble / 50000.0
    assert(relErr < 0.20, s"est=$est relErr=$relErr")
  }

  test("KMV merge adopts the smaller width when sketches disagree on k") {
    val a = (0L until 5000L).toDF("v").agg(kmv_sketch(col("v"), 256).as("sk"))
    val b = (2500L until 7500L).toDF("v").agg(kmv_sketch(col("v"), 1024).as("sk"))
    val merged = a.unionByName(b).agg(kmv_merge(col("sk")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val k = java.nio.ByteBuffer.wrap(merged).getInt
    assert(k == 256)
    // union is 7500 distinct — estimate should land near it, not near 5000
    val est = a.unionByName(b).agg(kmv_estimate(kmv_merge(col("sk"))).as("e"))
      .head().getLong(0)
    assert(math.abs(est - 7500L).toDouble / 7500.0 < 0.25, s"est=$est")
  }

  test("KMV streaming restore runs at min(restored, requested) capacity, both directions") {
    // the documented streamDistinctCounts restart rule: changing k
    // across restarts is the sound KMV trim, never a mixed-capacity
    // sketch. Pin it at the readInto level the state op actually uses.
    import graft.expressions.SketchExpressions
    val big = new SketchExpressions.KmvBuffer(64)
    (0 until 200).foreach(i => big.insert(SketchExpressions.hashString(s"v$i")))
    val blob = SketchExpressions.writeBuffer(big)
    // restart with SMALLER requested k: trims to 16 smallest hashes
    val shrunk = new SketchExpressions.KmvBuffer(16)
    SketchExpressions.readInto(blob, shrunk)
    assert(shrunk.k == 16 && shrunk.set.size == 16)
    val direct16 = new SketchExpressions.KmvBuffer(16)
    (0 until 200).foreach(i => direct16.insert(SketchExpressions.hashString(s"v$i")))
    assert(shrunk.set == direct16.set,
      "trimmed restore must equal the sketch built at k=16 from scratch")
    // restart with LARGER requested k: the serialized capacity wins
    // (the blob only kept 64 smallest - claiming k=256 would understate)
    val grown = new SketchExpressions.KmvBuffer(256)
    SketchExpressions.readInto(blob, grown)
    assert(grown.k == 64 && grown.set.size == 64)
  }

  // ---- KLL quantile sketch: graft.expressions.QuantileSketchExpressions

  import graft.expressions.QuantileSketchExpressions._

  test("KLL exact regime equals percentile, across partitions, with nulls skipped") {
    val vals = new scala.util.Random(11).shuffle((1 to 5000).toVector)
      .map(_.toDouble * 0.25)
    val df = vals.map(Option(_)).:+(Option.empty[Double]).toDF("v")
      .repartition(13)
    val row = df.agg(
      kll_sketch(col("v"), 16384).as("sk"),
      expr("percentile(v, 0.5)").as("p50e"),
      expr("percentile(v, 0.95)").as("p95e"),
      expr("percentile(v, 0.031)").as("podd")).head()
    val sk = row.getAs[Array[Byte]]("sk")
    assert(quantileOf(sk, 0.5) == row.getDouble(1))
    assert(quantileOf(sk, 0.95) == row.getDouble(2))
    assert(quantileOf(sk, 0.031) == row.getDouble(3))
    assert(graft.expressions.QuantileSketchExpressions
      .readBuffer(sk).totalWeight == 5000L)
  }

  test("KLL exact-regime binary is canonical under input reordering and sharded merge") {
    val vals = (1 to 4000).map(i => ((i * 37) % 4000).toDouble)
    val whole = vals.toDF("v").repartition(7)
      .agg(kll_sketch(col("v"), 8192).as("sk")).head().getAs[Array[Byte]](0)
    val reord = scala.util.Random.shuffle(vals).toDF("v").repartition(3)
      .agg(kll_sketch(col("v"), 8192).as("sk")).head().getAs[Array[Byte]](0)
    val sharded = vals.zipWithIndex.map { case (v, i) => (i % 5, v) }
      .toDF("shard", "v")
      .groupBy("shard").agg(kll_sketch(col("v"), 8192).as("sk"))
      .agg(kll_merge(col("sk")).as("sk")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, reord),
      "reordered input changed the exact-regime binary")
    assert(java.util.Arrays.equals(whole, sharded),
      "two-level merge changed the exact-regime binary")
  }

  test("KLL estimating regime: rank error within 2% at n=200k, k=1024; n stays exact") {
    val n = 200000
    val df = spark.range(n).select(
      (pmod(col("id") * 48271 % 200003, lit(200003))).cast("double").as("v"))
    val sk = df.agg(kll_sketch(col("v"), 1024).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(graft.expressions.QuantileSketchExpressions
      .readBuffer(sk).totalWeight == n.toLong)
    val exact = df.select("v").as[Double].collect().sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = quantileOf(sk, q).asInstanceOf[Double]
      // rank of the estimate in the true sorted order vs target rank
      val rank = java.util.Arrays.binarySearch(exact, est) match {
        case i if i >= 0 => i
        case i => -i - 1
      }
      val target = q * (n - 1)
      assert(math.abs(rank - target) <= 0.02 * n,
        s"q=$q est=$est rank=$rank target=$target")
    }
  }
}
