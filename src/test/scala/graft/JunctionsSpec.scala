package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.frame.Frame
import graft.operators.Junctions

class JunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(StructField("v", StringType)))

  private def frame(vs: String*): Frame =
    Frame.fromLocal(spark, schema, vs.map(Row(_)))

  private def values(f: Frame): Seq[String] =
    f.ordered.collect().map(_.getAs[String]("v")).toSeq

  test("hub concatenates inputs in order (J1)") {
    assert(values(Junctions.hub(Seq(frame("a1", "a2"), frame("b1"), frame("c1", "c2")))) ==
      Seq("a1", "a2", "b1", "c1", "c2"))
  }

  test("roundRobin interleaves, ragged tails continue among survivors (J3)") {
    val got = values(Junctions.roundRobin(Seq(
      frame("a1", "a2", "a3"), frame("b1"), frame("c1", "c2"))))
    // round 0: a1 b1 c1; round 1: a2 c2 (b exhausted); round 2: a3
    assert(got == Seq("a1", "b1", "c1", "a2", "c2", "a3"))
  }

  test("randomHub is a seeded permutation of the union (J2)") {
    val fs = Seq(frame("a1", "a2"), frame("b1", "b2"))
    val got = values(Junctions.randomHub(fs, seed = 5L))
    assert(got.sorted == Seq("a1", "a2", "b1", "b2"))
    assert(got == values(Junctions.randomHub(fs, seed = 5L)))
  }

  test("switch routes to the selected component (J4)") {
    val m = Map("x" -> frame("x1"), "y" -> frame("y1"))
    assert(values(Junctions.switch(m, "y")) == Seq("y1"))
  }

  test("intersectData / exceptData (J5)") {
    val a = frame("p", "q", "r")
    val b = frame("q", "r", "s")
    assert(values(Junctions.intersectData(a, b)) == Seq("q", "r"))
    assert(values(Junctions.exceptData(a, b)) == Seq("p"))
  }
}
