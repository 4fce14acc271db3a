package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.FreqSketchExpressions._

/** Misra-Gries frequent-items sketch: exactness below capacity,
  * MG error bounds in the overflow regime (undercount-only, ≤
  * N/(capacity+1), heavy items always retained — bounds that survive
  * distributed merging per Agarwal et al.'s mergeable-summaries
  * result), and the deterministic top-k order. */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, cap: Int, k: Int) =
    df.agg(mg_sketch(col("v"), cap).as("sk"))
      .select(explode(mg_topk(col("sk"), k)).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("exact counts below capacity, stable under repartitioning (merge path)") {
    // 40 distinct items with distinct frequencies 1..40
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(f"w$i%02d"))
    val df = rows.toDF("v").repartition(17)
    val got = topk(df, cap = 64, k = 40)
    val expected = (40 to 1 by -1).map(i => (f"w$i%02d", i.toLong))
    assert(got == expected)
  }

  test("overflow regime: undercount-only within N/(cap+1), heavy item retained") {
    // N = 1000: one heavy item (400), 600 spread over 200 light items
    val rows = Seq.fill(400)("heavy") ++
      (0 until 600).map(i => s"light${i % 200}")
    val df = rows.toDF("v").repartition(8)
    val got = topk(df, cap = 8, k = 8).toMap
    assert(got.contains("heavy"), s"heavy item evicted: $got")
    val est = got("heavy")
    assert(est <= 400L, s"MG must never overestimate: $est")
    assert(400L - est <= 1000L / 9 + 1, s"undercount too large: $est")
  }

  test("two-level rollup (mg_merge of per-group sketches) matches the direct sketch") {
    val rows = (1 to 30).flatMap(i => Seq.fill(i)(f"w$i%02d"))
    val df = rows.zipWithIndex.map { case (v, i) => (i % 5, v) }.toDF("g", "v")
    val direct = topk(rows.toDF("v"), cap = 64, k = 30)
    val rolled = df.groupBy("g").agg(mg_sketch(col("v"), 64).as("sk"))
      .agg(mg_merge(col("sk")).as("sk"))
      .select(explode(mg_topk(col("sk"), 30)).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rolled == direct)
  }

  test("top-k order is (count DESC, item ASC) — ties broken by item") {
    val rows = Seq("b", "b", "a", "a", "c")
    val got = topk(rows.toDF("v"), cap = 16, k = 3)
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("nulls are skipped") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("v")
    assert(topk(df, cap = 4, k = 4) == Seq(("x", 2L)))
  }
}
