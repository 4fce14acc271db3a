package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 90% of the big side hits one hot key
    val big = (0 until 2000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, s"row$i")
    }.toDF("key", "payload")
    val small = Seq((42L, "HOT"), (0L, "a"), (1L, "b"), (3L, "c"))
      .toDF("key", "dim")
    val plain = big.join(small, "key")
      .select("key", "payload", "dim").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "key", salts = 8)
      .select("key", "payload", "dim").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    assert(salted.length > 1800) // hot key actually joined
  }

  test("salt is deterministic and spreads keys") {
    val df = (0 until 100).map(i => (i.toLong, i.toString)).toDF("k", "v")
    val salts = df.select(Skew.salt(8, col("k"), col("v")).as("s"))
      .collect().map(_.getInt(0))
    assert(salts.forall(s => s >= 0 && s < 8))
    assert(salts.distinct.length > 4) // spreads
    val again = df.select(Skew.salt(8, col("k"), col("v")).as("s"))
      .collect().map(_.getInt(0))
    assert(salts.sameElements(again))
  }
}
