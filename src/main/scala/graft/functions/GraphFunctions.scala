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
    * node-sized update (Catalyst broadcasts it); sinks are read off
    * the rank frame's carried `__rdeg` column (null = no out-edges),
    * so finding them is a filter, not a join; n is read once at entry
    * (a count, the only driver-side scalar).
    *
    * Lineage: the loop references the evolving `rank` frame exactly
    * ONCE per iteration (the contribution join) — the update joins a
    * STATIC (id, __rdeg) frame instead of `rank`, so the lazy chain
    * grows linearly, one iteration deep per iteration (optimization
    * r19: r18's unconditional per-iteration eager localCheckpoint
    * taxed the plain arm with a materialization job per iteration,
    * x52 0.25 → 1.65 s). The dangling arm is the exception: its
    * sink-mass aggregate is a second reference to `rank` per
    * iteration, so a lazy chain replays the whole segment per
    * reference (2–3× growth per iteration) — with `reliable = false`
    * (the default, single-JVM/local runs) THAT arm severs every
    * iteration with an eager `localCheckpoint` (the r18 fix, x52b
    * 9.5 → 3.6 s; the `checkpointEvery` dial is subsumed there).
    * With `reliable = true` (real clusters) the chain is pure
    * lineage — executor-loss recovery replays it — cut every
    * `checkpointEvery` iterations by a fault-tolerant `checkpoint`
    * (requires `setCheckpointDir` on durable storage; same knob as
    * nearDupClusters/semDedup); keep the dial small, past ~10
    * iterations analysis/codegen cost grows superlinearly. x52b gates
    * iters = 15 with checkpointEvery = 5 inside the oracle: the
    * severed plan must produce bit-identical ranks. */
  def pageRankMicro(nodes: DataFrame, edges: DataFrame,
                    iters: Int, dampPct: Int,
                    danglingRedistribute: Boolean = false,
                    checkpointEvery: Int = 0,
                    reliable: Boolean = false): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    // Optimization-round restructure (r18 + r19, guide §1.2/§2.4 —
    // bit-identical arithmetic, A/B'd on x52/x52b):
    //
    //  1. (r18) The rank frame CARRIES its node's out-degree (`__rdeg`,
    //     null for sinks): each iteration joins raw edges to rank
    //     directly (src's degree rides on the rank row — the
    //     per-iteration edges⨝deg rebuild is gone) and the dangling
    //     arm's sink mass is a FILTER+agg over rank instead of a
    //     node-sized anti-join.
    //  2. (r19) The update join reads the STATIC (id, __rdeg) frame
    //     `rankStatic`, not the evolving `rank` — __rdeg never changes,
    //     so the join is semantics-identical, and the plain arm's only
    //     per-iteration reference to `rank` is the contribution join:
    //     a lazy chain grows LINEARLY and needs no severing at all
    //     (r18's unconditional eager localCheckpoint paid one
    //     materialization job per iteration on an arm with no replay
    //     problem — x52 0.25 → 1.65 s, the round's one real
    //     regression).
    //  3. (r18) The dangling arm references rank TWICE per iteration
    //     (contribution join + sink-mass aggregate), so a lazy chain
    //     replays the whole segment per reference (x52b before: wall
    //     7.95 s at 1.45 s cpu — the gap was driver replanning +
    //     recompute of the self-similar reference tree; 10 206-line
    //     explain). In local mode (`reliable = false`) THAT arm severs
    //     every iteration with an eager localCheckpoint: each
    //     iteration is AQE-planned fresh (tiny broadcast joins at
    //     fixture scale; honest shuffles at corpus scale) over a
    //     materialized LogicalRDD. The A/B that persisted each
    //     iteration instead was WORSE in cpu (9.5 → 22 s wall, 88 s
    //     cpu): cached subplans are compiled without AQE, so every
    //     tiny iteration ran as 32-partition sort-merge joins.
    //     Block-manager storage of superseded generations is reclaimed
    //     by the ContextCleaner as the loop drops its references.
    //  4. `reliable = true` (real clusters) keeps the pure-lineage
    //     chain between `checkpointEvery` reliable checkpoints — the
    //     fault-tolerance contract is unchanged.
    val deg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
    val base = (100L - dampPct) * 10000L
    val n = if (danglingRedistribute) nodes.count() else 0L
    val eagerSever = !reliable && danglingRedistribute
    val e0 = edges.select("src", "dst")
    val e = if (eagerSever) e0.localCheckpoint() else e0
    val rank0 = nodes.join(deg, nodes("id") === deg("src"), "left")
      .select(nodes("id"), lit(1000000L).as("rank_micro"),
        col("__deg").as("__rdeg"))
    val rankStatic = if (eagerSever) rank0.localCheckpoint() else rank0
    var rank = rankStatic
    for (i <- 1 to iters) {
      // src's out-degree == its rank row's __rdeg (non-null whenever an
      // edge exists), so `rank_micro DIV __rdeg` is bit-identical to the
      // old `rank_micro DIV __deg` against the edges⨝deg relation
      val contrib = e.join(rank, e("src") === rank("id"))
        .select(col("dst"), expr("rank_micro DIV __rdeg").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__s"))
      // __rdeg is iteration-invariant: joining the static frame keeps
      // this the plain arm's ONLY reference to the evolving rank chain
      val withS = rankStatic.join(contrib,
        rankStatic("id") === contrib("dst"), "left")
      val next =
        if (!danglingRedistribute)
          withS.select(rankStatic("id"),
            (lit(base) + expr(s"($dampPct * coalesce(__s, 0L)) DIV 100"))
              .as("rank_micro"),
            rankStatic("__rdeg"))
        else {
          // sinks are exactly the rank rows with no out-degree — the
          // same set the old left_anti against deg produced
          val sinkMass = rank.filter(col("__rdeg").isNull)
            .agg(coalesce(sum("rank_micro"), lit(0L)).as("__dm"))
          withS.crossJoin(sinkMass)
            .select(rankStatic("id"),
              (lit(base) + expr(
                s"($dampPct * (coalesce(__s, 0L) + __dm DIV $n)) DIV 100"))
                .as("rank_micro"),
              rankStatic("__rdeg"))
        }
      rank =
        if (eagerSever) next.localCheckpoint()
        else if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
          (if (reliable) next.checkpoint() else next.localCheckpoint())
        else next
    }
    rank.select("id", "rank_micro")
  }
}
