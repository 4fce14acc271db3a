package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.SimilarityFunctions._

/** Similarity-search queries over the `embeddings` table. */
object SimilarityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 for 10 query vectors (exact baseline).
    "s1_ann_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed approximate top-5 (the 100 TB scale path: bucket
    // join prunes the corpus before exact rerank). Approximate by
    // design → no SQL oracle; the driver records a rows-only check and
    // SimilaritySpec measures recall vs s1 at test time.
    "s2_ann_lsh" -> ((s, d) => {
      val e = embeddings(s, d)
      lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, seed = 42L, planes = 4, dim = 64)
        .orderBy("query_id", "rank")
    }),

    // IVF approximate top-5: nearest-centroid cells + nprobe probing
    // (the other scale path besides LSH). Approximate → rows-only;
    // SimilaritySpec measures recall vs s1.
    "s4_ann_ivf" -> ((s, d) => {
      val e = embeddings(s, d)
      ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, centroids = 16, nprobe = 4)
        .orderBy("query_id", "rank")
    }),

    // Pairwise L2 distance on a small slice (distance-metric parity).
    "s3_l2_pairs" -> ((s, d) => {
      val e = embeddings(s, d).filter(col("vec_id") < 30)
        .select("vec_id", "embedding")
      e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          round(l2Distance(col("x.embedding"), col("y.embedding")), 6).as("dist"))
        .orderBy("a", "b")
    })
  )

  def oracles: Map[String, String] = Map(
    "s1_ann_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        | q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        | s AS (
        |  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
        |    round(list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * e.v[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * q.qv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i])))), 6) AS score
        |  FROM e, q WHERE e.vec_id <> q.qid),
        | r AS (SELECT query_id, neighbor_id, score,
        |   CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
        |   FROM s)
        |SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "s3_l2_pairs" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 30)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  round(sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))), 6) AS dist
        |FROM e a, e b WHERE a.vec_id < b.vec_id ORDER BY a, b""".stripMargin
  )
}
