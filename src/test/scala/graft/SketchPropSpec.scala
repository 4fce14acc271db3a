package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.SketchExpressions
import graft.expressions.FreqSketchExpressions

/** Driver-side property tests for the sketch buffer algebra — the
  * merge/bound laws the distributed guarantees rest on, pinned on
  * seeded random inputs without a Spark job (the Spark-side wiring is
  * SketchSpec/FreqSketchSpec's job). */
class SketchPropSpec extends AnyFunSuite {

  // ---- KMV ----

  private def kmvOf(hashes: Seq[Long], k: Int): Array[Byte] = {
    val b = new SketchExpressions.KmvBuffer(k)
    hashes.foreach(b.insert)
    SketchExpressions.writeBuffer(b)
  }

  private def mergeBytes(parts: Seq[Array[Byte]]): Array[Byte] = {
    val b = new SketchExpressions.KmvBuffer(Int.MaxValue)
    parts.foreach(SketchExpressions.readInto(_, b))
    SketchExpressions.writeBuffer(b)
  }

  test("property: KMV is exact below k for random multisets, any insert order") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val distinct = 1 + rnd.nextInt(400)
      val values = Seq.fill(distinct)(rnd.nextLong())
      val stream = rnd.shuffle(values ++ Seq.fill(distinct * 2)(
        values(rnd.nextInt(distinct))))
      val bytes = kmvOf(stream, k = 512)
      assert(SketchExpressions.estimate(bytes) == values.distinct.size.toLong,
        s"seed=$seed")
      // order-insensitive: a different shuffle gives identical bytes
      assert(java.util.Arrays.equals(bytes, kmvOf(rnd.shuffle(stream), 512)))
    }
  }

  test("property: KMV merge is commutative, associative, idempotent (bit-identical)") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(100 + seed)
      def part() = Seq.fill(200 + rnd.nextInt(300))(rnd.nextLong() % 500)
      val (a, b, c) = (kmvOf(part(), 64), kmvOf(part(), 64), kmvOf(part(), 64))
      val ab = mergeBytes(Seq(a, b))
      assert(java.util.Arrays.equals(ab, mergeBytes(Seq(b, a))))
      assert(java.util.Arrays.equals(
        mergeBytes(Seq(ab, c)), mergeBytes(Seq(a, mergeBytes(Seq(b, c))))))
      assert(java.util.Arrays.equals(mergeBytes(Seq(a, a)), a))
    }
  }

  test("property: KMV estimating-regime error within the analytic band") {
    // rel err ≈ 1/sqrt(k-2); allow 5 sigma at k=512 (~0.22)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(200 + seed)
      val n = 5000 + rnd.nextInt(45000)
      val hashes = (0 until n).map(_ => rnd.nextLong()).distinct
      val est = SketchExpressions.estimate(kmvOf(hashes, 512))
      val rel = math.abs(est - hashes.size).toDouble / hashes.size
      assert(rel < 5.0 / math.sqrt(510.0), s"seed=$seed n=${hashes.size} est=$est rel=$rel")
    }
  }

  // ---- Misra-Gries ----

  private def mgOf(items: Seq[String], cap: Int): FreqSketchExpressions.MgBuffer = {
    val b = new FreqSketchExpressions.MgBuffer(cap)
    items.foreach(b.add(_, 1L))
    b
  }

  test("property: MG bounds hold for random streams under random merge trees") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(300 + seed)
      val cap = 4 + rnd.nextInt(28)
      val vocab = cap + rnd.nextInt(3 * cap)
      val n = 500 + rnd.nextInt(2000)
      // zipf-ish: item i drawn with weight ~ 1/(i+1)
      val weights = (0 until vocab).map(i => 1.0 / (i + 1))
      val total = weights.sum
      def draw(): String = {
        var u = rnd.nextDouble() * total; var i = 0
        while (u > weights(i)) { u -= weights(i); i += 1 }
        s"i$i"
      }
      val stream = Seq.fill(n)(draw())
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random partitioning into 1..6 parts, merged pairwise in order
      val parts = stream.grouped(math.max(1, n / (1 + rnd.nextInt(6)))).toSeq
      val merged = parts.map(mgOf(_, cap)).reduce { (a, b) => a.mergeFrom(b); a }
      val est = {
        val it = merged.counts.entrySet().iterator()
        val m = scala.collection.mutable.Map[String, Long]()
        while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue }
        m.toMap
      }
      val bound = n.toLong / (cap + 1)
      est.foreach { case (item, c) =>
        assert(c <= truth(item), s"seed=$seed overestimate: $item $c > ${truth(item)}")
        assert(truth(item) - c <= bound,
          s"seed=$seed undercount beyond N/(cap+1): $item $c vs ${truth(item)} bound=$bound")
      }
      truth.foreach { case (item, c) =>
        if (c > bound)
          assert(est.contains(item), s"seed=$seed heavy item $item (count $c > $bound) evicted")
      }
      assert(merged.counts.size <= cap, s"seed=$seed state over capacity")
    }
  }

  test("property: MG exact when distinct <= capacity, under any partitioning") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(400 + seed)
      val vocab = 1 + rnd.nextInt(40)
      val stream = Seq.fill(800)(s"i${rnd.nextInt(vocab)}")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val parts = stream.grouped(1 + rnd.nextInt(200)).toSeq
      val merged = parts.map(mgOf(_, cap = 64)).reduce { (a, b) => a.mergeFrom(b); a }
      val it = merged.counts.entrySet().iterator()
      var n = 0
      while (it.hasNext) {
        val e = it.next()
        assert(e.getValue == truth(e.getKey), s"seed=$seed ${e.getKey}")
        n += 1
      }
      assert(n == truth.size, s"seed=$seed missing items")
    }
  }
}
