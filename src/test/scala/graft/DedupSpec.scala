package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DedupFunctions._

/** Transitive-clustering correctness on adversarial graph shapes: the
  * oracle-checked d6 exercises shallow real clusters; these pin the
  * deep/degenerate topologies (path-halving must still find the true
  * min label, not a locally-propagated one). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a 64-node path graph clusters to its minimum endpoint") {
    // worst case for plain min-label propagation (diameter = n-1);
    // path halving converges in O(log n) rounds
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = nearDupClusters(pairs)
    val got = labels.select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(got.size == 64)
    assert(got.values.forall(_ == 0L), got.filter(_._2 != 0L).toString)
    labels.unpersist()
  }

  test("disjoint components get their own min labels (star + chain + pair)") {
    val pairs = Seq(
      // star centered at 100 (edges listed high-to-low to exercise both directions)
      (100L, 101L), (102L, 100L), (100L, 103L),
      // chain 7-5-3 written out of order
      (5L, 3L), (7L, 5L),
      // isolated pair
      (200L, 201L)
    ).toDF("a", "b")
    val labels = nearDupClusters(pairs)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 100L, 101L -> 100L, 102L -> 100L, 103L -> 100L,
      3L -> 3L, 5L -> 3L, 7L -> 3L, 200L -> 200L, 201L -> 200L))
    labels.unpersist()
  }

  test("dedupDecision keeps exactly one representative per cluster") {
    val docs = (0L until 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("a", "b")
    val labels = nearDupClusters(pairs)
    val decision = dedupDecision(docs, "doc_id", labels)
    val kept = decision.filter(col("keep")).select("doc_id").as[Long].collect().toSet
    // 1 represents {1,2,3}, 8 represents {8,9}, singletons represent themselves
    assert(kept == Set(0L, 1L, 4L, 5L, 6L, 7L, 8L))
    labels.unpersist()
  }
}
