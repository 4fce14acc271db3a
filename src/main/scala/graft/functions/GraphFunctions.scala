package graft.functions

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Link-graph quality scoring (beyond-reference surface): the
  * PageRank-family centrality real web-corpus curation uses as a
  * document/host quality prior (Page et al. 1999; Common-Crawl-scale
  * pipelines rank hosts before sampling). The reference has no graph
  * surface at all.
  *
  * Deterministic INTEGER-MICRO arithmetic (the x19 perplexity
  * discipline): ranks live in millionths, the damping update is
  * `(100−d)·10⁴ + (d · Σ floor(rank/outdeg)) DIV 100` in BIGINT —
  * floor division at every step, so both engines compute identical
  * bits and the oracle gates rank VALUES, not rounded shadows.
  * Float PageRank would drift across engines after one iteration.
  *
  * Scale shape: a FIXED number of iterations, each one edge-sized
  * join + one groupBy(dst) aggregation (map-side partial sums) and a
  * node-sized left join back — exchange ∝ edges per iteration, the
  * standard distributed-PageRank envelope. No driver-side state
  * beyond the loop counter; the lineage is `iters` joins deep, which
  * is fine for the bounded iteration counts this models (quality
  * priors converge in a handful of iterations; checkpoint between
  * iterations the nearDupClusters way if a caller dials it high).
  */
object GraphFunctions {

  /** `iters` synchronous PageRank iterations over `edges` (columns
    * `src`, `dst`; parallel edges each contribute, matching the
    * degree count), damping `dampPct`/100, ranks in millionths
    * starting at 10⁶ per node. Nodes must appear in `nodes` (column
    * `id`); sink nodes (no out-edges) simply leak mass, the
    * simplest deterministic convention — callers wanting
    * redistribute-to-all can add the dangling term themselves.
    * Returns (id, rank_micro: long). */
  def pageRankMicro(nodes: DataFrame, edges: DataFrame,
                    iters: Int, dampPct: Int): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
    val e = edges.join(deg, Seq("src"))
    val base = (100L - dampPct) * 10000L
    var rank = nodes.select(col("id"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val contrib = e.join(rank, e("src") === rank("id"))
        .select(col("dst"), expr("rank_micro DIV __deg").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__s"))
      rank = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(base) + expr(s"($dampPct * coalesce(__s, 0L)) DIV 100"))
            .as("rank_micro"))
    }
    rank
  }
}
