package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SimilarityFunctions._
import graft.functions.DedupFunctions._

/** Recall/quality properties of the approximate paths against their
  * exact baselines (sf0.001 fixtures). */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("LSH top-k recall vs brute force is reasonable at 4 planes") {
    val e = graft.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val exact = bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = lshTopK(e, q, "vec_id", "embedding", k = 5,
        seed = 42L, planes = 4, dim = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 4 planes ≈ 1/16 of the corpus per bucket; random vectors → modest
    // recall by design. The property that matters: buckets are
    // deterministic, candidates are real rows, and recall is nonzero.
    assert(recall > 0.05, s"recall=$recall")
    assert(approx.nonEmpty && approx.forall { case (q2, n) => q2 != n })
  }

  test("IVF top-k probes its cells deterministically with nonzero recall") {
    val e = graft.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val exact = bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = ivfTopK(e, q, "vec_id", "embedding", k = 5, centroids = 16, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall > 0.1, s"recall=$recall")
    // deterministic across runs
    val ivf2 = ivfTopK(e, q, "vec_id", "embedding", k = 5, centroids = 16, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == ivf2)
  }

  test("MinHash LSH candidates lose no pair at Jaccard >= 0.8 (complete recall on fixture)") {
    val docs = graft.Tables.documents(spark, sf)
    val lsh = minhashNearDuplicates(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact brute force over all pairs
    val sh = docs.select(col("doc_id"), wordShingles(col("text"), 3).as("sh"))
    val brute = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        jaccard(col("x.sh"), col("y.sh")).as("jac"))
      .filter(col("jac") >= 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"lsh=${lsh.size} brute=${brute.size}")
  }
}
