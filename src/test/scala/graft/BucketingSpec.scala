package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

/** Bucketed co-located join: pre-shuffled tables join with no
  * exchange — the 100 TB repeated-join strategy, asserted on the
  * physical plan. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed join elides both shuffles and matches the plain join") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, d).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", 8)

    val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n${plan.take(1500)}")

    val plain = li.join(o, "l_orderkey")
    assert(joined.count() == plain.count())
  }
}
