package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.RangeJoin

/** Banded range join vs a hand-computed case with both a before and an
  * after bound (the oracle query exercises only before). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("byBucket matches the exact interval semantics incl. boundaries") {
    val left = Seq((1L, ts(30), "L1"), (2L, ts(30), "L2"))
      .toDF("k", "lts", "lid")
    val right = Seq(
      (1L, ts(19, 59), "tooEarly"),  // 601s before: out ([-600, +300])
      (1L, ts(20, 0), "atBefore"),   // exactly 600s before: in
      (1L, ts(31), "within"),
      (1L, ts(35, 0), "atAfter"),    // exactly 300s after: in
      (1L, ts(35, 1), "tooLate"),
      (2L, ts(30), "exact")
    ).toDF("k", "rts", "rid")
    val got = RangeJoin.byBucket(left, right, Seq("k"), "lts", "rts",
        beforeSec = 600L, afterSec = 300L, binWidthSec = 120L)
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("L1", "atBefore"), ("L1", "within"), ("L1", "atAfter"),
      ("L2", "exact")))
  }
}
