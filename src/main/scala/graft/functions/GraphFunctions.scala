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
  * beyond the loop counter; the lineage is `iters` joins deep —
  * bounded by the `checkpointEvery` dial (gated at iters = 15 by
  * x52b, which also exercises the dangling-mass redistribution arm).
  */
object GraphFunctions {

  /** `iters` synchronous PageRank iterations over `edges` (columns
    * `src`, `dst`; parallel edges each contribute, matching the
    * degree count), damping `dampPct`/100, ranks in millionths
    * starting at 10⁶ per node. Nodes must appear in `nodes` (column
    * `id`). Returns (id, rank_micro: long).
    *
    * Sink (dangling) nodes: by default they leak mass — the simplest
    * deterministic convention, fine for fixed-iteration quality
    * priors. `danglingRedistribute = true` adds the convention real
    * host-rank uses (Page et al. 1999 §2.7): each iteration the sink
    * nodes' total rank is shared to EVERY node as `floor(Σ_sink rank
    * / n)` before damping, in the same integer-micro arithmetic —
    * the sink total is a 1-row aggregate crossJoined onto the
    * node-sized update (Catalyst broadcasts it), plus one node-sized
    * anti-join to find the sinks; n is read once at entry (a count,
    * the only driver-side scalar).
    *
    * Lineage: each iteration adds one join + groupBy, so `iters`
    * joins stack into one plan — fine to ~10 iterations, but past
    * that analysis/codegen cost grows superlinearly and executor-loss
    * recovery replays the whole chain. `checkpointEvery = k > 0`
    * severs the lineage every k iterations: `localCheckpoint` by
    * default (single-JVM / local runs — blocks on executors),
    * `reliable = true` for fault-tolerant `checkpoint` on a real
    * cluster (requires `setCheckpointDir` on durable storage; same
    * knob as nearDupClusters/semDedup). x52b gates iters = 15 with
    * checkpointEvery = 5 inside the oracle: the severed plan must
    * produce bit-identical ranks. */
  def pageRankMicro(nodes: DataFrame, edges: DataFrame,
                    iters: Int, dampPct: Int,
                    danglingRedistribute: Boolean = false,
                    checkpointEvery: Int = 0,
                    reliable: Boolean = false): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
    val e = edges.join(deg, Seq("src"))
    val base = (100L - dampPct) * 10000L
    val n = if (danglingRedistribute) nodes.count() else 0L
    var rank = nodes.select(col("id"), lit(1000000L).as("rank_micro"))
    for (i <- 1 to iters) {
      val contrib = e.join(rank, e("src") === rank("id"))
        .select(col("dst"), expr("rank_micro DIV __deg").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__s"))
      val withS = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
      val next =
        if (!danglingRedistribute)
          withS.select(nodes("id"),
            (lit(base) + expr(s"($dampPct * coalesce(__s, 0L)) DIV 100"))
              .as("rank_micro"))
        else {
          val sinkMass = rank.join(deg, rank("id") === deg("src"), "left_anti")
            .agg(coalesce(sum("rank_micro"), lit(0L)).as("__dm"))
          withS.crossJoin(sinkMass)
            .select(nodes("id"),
              (lit(base) + expr(
                s"($dampPct * (coalesce(__s, 0L) + __dm DIV $n)) DIV 100"))
                .as("rank_micro"))
        }
      rank =
        if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
          (if (reliable) next.checkpoint() else next.localCheckpoint())
        else next
    }
    rank
  }
}
