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

  test("AQE splits a planted-skew shuffle join at runtime (skew marker in the final plan)") {
    // the runtime complement to salting: with thresholds scaled to the
    // fixture, AQE's OptimizeSkewedJoin must split the hot partition
    // instead of one task dragging the stage
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: ~90% of 200k rows on one hot key, ~70 B per row
      val big = spark.range(200000).select(
        when(col("id") % 10 =!= 0, lit(777L)).otherwise(col("id") % 500).as("key"),
        concat(lit("x" * 60), col("id")).as("pad"))
      val dim = spark.range(1000).select((col("id") % 1000).as("key"), col("id").as("d"))
      val joined = big.join(dim, "key")
      // execute THIS plan (count() would plan a separate query and the
      // AQE skew decision lives in the executed plan)
      val n = joined.collect().length
      // every big row matches exactly one dim key in [0, 1000)
      assert(n == 200000, s"n=$n")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.toLowerCase.contains("skewed"),
        s"no skew split in plan:\n${p.take(1500)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
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
