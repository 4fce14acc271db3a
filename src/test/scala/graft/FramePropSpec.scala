package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.frame.Frame

/** ScalaCheck-generator-driven properties for the positional-index
  * algebra (SURVEY §5: "replace constructor-combination loops with real
  * properties"). Generators are sampled from fixed seeds so each Spark
  * job count stays bounded and runs are reproducible.
  */
class FramePropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(StructField("v", LongType)))

  private def frame(n: Int): Frame =
    Frame.fromLocal(spark, schema, (0 until n).map(i => Row(i.toLong * 3)))

  private def values(f: Frame): Seq[Long] =
    f.ordered.collect().map(_.getAs[Long]("v")).toSeq

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val trials = 1L to 6L

  test("property: permute then inverse-permute is identity") {
    val permGen = Gen.chooseNum(2, 9).flatMap(n => Gen.const(n))
    for (seed <- trials) {
      val n = sample(permGen, seed)
      val perm = new scala.util.Random(seed).shuffle((0L until n.toLong).toList)
      val inverse = perm.zipWithIndex.sortBy(_._1).map(_._2.toLong)
      val f = frame(n)
      assert(f.permute(perm).permute(inverse).sameAs(f), s"seed=$seed perm=$perm")
    }
  }

  test("property: select(indices) returns exactly those rows in order") {
    val picksGen = Gen.listOfN(6, Gen.chooseNum(0, 9))
    for (seed <- trials) {
      val picks = sample(picksGen, seed).map(_.toLong)
      assert(values(frame(10).select(picks)) == picks.map(_ * 3), s"seed=$seed")
    }
  }

  test("property: append length and content law") {
    val g2 = for { a <- Gen.chooseNum(1, 8); b <- Gen.chooseNum(1, 8) } yield (a, b)
    for (seed <- trials) {
      val (a, b) = sample(g2, seed)
      val fa = frame(a); val fb = frame(b)
      val g = fa.append(fb)
      assert(g.length == a + b)
      assert(values(g) == values(fa) ++ values(fb), s"seed=$seed")
    }
  }

  test("property: delete complement keeps order and renumbers densely") {
    val delGen = Gen.someOf(0 until 8)
    for (seed <- trials) {
      val del = sample(delGen, seed).toSeq
      val kept = (0 until 8).filterNot(del.contains)
      val g = frame(8).delete(del.map(_.toLong))
      assert(values(g) == kept.map(_.toLong * 3), s"seed=$seed del=$del")
      assert(g.ordered.select(Frame.IDX).collect().map(_.getLong(0)).toSeq ==
        kept.indices.map(_.toLong), s"seed=$seed")
    }
  }

  test("property: slice equals select of the range") {
    val startGen = Gen.chooseNum(0, 9)
    for (seed <- trials) {
      val start = sample(startGen, seed)
      val end = math.min(start + 4, 10)
      val f = frame(10)
      assert(f.slice(start.toLong, end.toLong)
        .sameAs(f.select(start.toLong until end.toLong)), s"seed=$seed")
    }
  }
}
