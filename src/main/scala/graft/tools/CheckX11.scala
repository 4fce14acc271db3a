package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DedupFunctions._

/** One-off round-7 check: containmentPairs (new group-bound form) must
  * equal the brute-force containment scan on the real sf0.01 corpus,
  * and the sf0.1 candidate count must land below the round-6 3.01M
  * line recorded in SCALE.md. */
object CheckX11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("check-x11").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf001 = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)

    // brute-force directed containment at t=0.7, word 3-shingles over
    // the hashed (40-bit md5) space — same measure as the scale path
    val hs = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(wordShingles(col("text"), 3),
        s => conv(md5(s).substr(lit(1), lit(10)), 16, 10).cast("long")))).as("__hs"))
    val brute = hs.as("x").join(hs.as("y"), col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        round(graft.expressions.HashExpressions.sorted_long_intersect_count(
            col("x.__hs"), col("y.__hs")).cast("double") /
          size(col("x.__hs")).cast("double"), 6).as("containment"))
      .filter(col("containment") >= 0.7)
    val fast = containmentPairs(docs, "doc_id", "text", 3, 0.7)

    val bset = brute.select("a", "b", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fset = fast.select("a", "b", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"sf0.01: brute=${bset.size} fast=${fset.size} " +
      s"missing=${(bset -- fset).size} extra=${(fset -- bset).size}")
    assert(bset == fset, s"MISMATCH missing=${(bset -- fset).take(5)} extra=${(fset -- bset).take(5)}")
    fast.unpersist(blocking = false)

    // sf0.1 candidate count + end-to-end time, new stage shape
    val sf01 = "/root/testdata/sf0.1"
    val big = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
    val t0 = System.nanoTime()
    val p = containmentPairs(big, "doc_id", "text", 3, 0.7)
    val pairs = p.count()
    val secs = (System.nanoTime() - t0) / 1e9
    p.unpersist(blocking = false)

    // candidate reconstruction at the group-bound stage
    import org.apache.spark.sql.expressions.Window
    val t = 0.7
    val tok = big.select(col("doc_id").as("__id"),
        wordShingles(col("text"), 3).as("__sh"))
      .select(col("__id"), size(col("__sh")).as("__na"), explode(col("__sh")).as("__s"))
    val dfreq = tok.groupBy("__s").agg(count(lit(1)).as("__df"))
    val ranked = tok.join(dfreq, Seq("__s"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__df"), col("__s"))))
      .drop("__df")
    val prefix = ranked
      .filter(col("__rn") <= col("__na") - ceil(lit(t) * col("__na") - lit(1e-9)) + 1)
      .select(col("__id").as("__pa"), col("__s"),
        col("__rn").as("__ra"), col("__na").as("__naa"))
    val cand = prefix.join(ranked.select(col("__id").as("__pb"), col("__s"),
        col("__rn").as("__rb"), col("__na").as("__nab")), Seq("__s"))
      .filter(col("__pa") =!= col("__pb") &&
        lit(1) + least(col("__naa") - col("__ra"), col("__nab") - col("__rb")) >=
          ceil(lit(t) * col("__naa") - lit(1e-9)) - ceil(lit(0.05) * col("__naa")))
      .groupBy("__pa", "__pb", "__naa", "__nab")
      .agg(count(lit(1)).as("__cnt"), max("__ra").as("__mra"), max("__rb").as("__mrb"))
      .filter(col("__cnt") +
          least(col("__naa") - col("__mra"), col("__nab") - col("__mrb")) >=
        ceil(lit(t) * col("__naa") - lit(1e-9)))
      .count()
    // round-5/6 bound for comparison: per-row positional + distinct
    val oldCand = prefix.join(ranked.select(col("__id").as("__pb"), col("__s"),
        col("__rn").as("__rb"), col("__na").as("__nab")), Seq("__s"))
      .filter(col("__pa") =!= col("__pb") &&
        lit(1) + least(col("__naa") - col("__ra"), col("__nab") - col("__rb")) >=
          ceil(lit(t) * col("__naa") - lit(1e-9)))
      .select("__pa", "__pb").distinct().count()
    println(f"sf0.1: pairs=$pairs newCandidates=$cand oldCandidates=$oldCand time=$secs%.1f s")
    spark.stop()
  }
}
