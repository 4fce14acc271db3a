package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the scale properties ARCHITECTURE.md
  * claims are verified here, not just stated. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("q3 star join broadcasts dimensions (no shuffle of the fact table for dims)") {
    val p = plan("q3_join_star")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q10 pushes filters and prunes columns at the parquet scan") {
    val p = plan("q10_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(800))
    // pruned read schema: only the 4 referenced columns
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"), p.take(1200))
  }

  test("q1 aggregation is two-phase hash agg (map-side partial combine)") {
    val p = plan("q1_agg_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("s1 ANN broadcasts the query set (corpus scanned once, no corpus shuffle)") {
    val p = plan("s1_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(800))
  }

  test("x10 stratified sampling plans a single exchange (both windows share the class partitioning)") {
    val p = plan("x10_stratified")
    assert("Exchange hashpartitioning\\(o_orderpriority".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("q28 bloom prune filters the fact scan before the semi join (sketch ahead of shuffle)") {
    // sf0.01: the smallest SF whose supplier table has nation-5 rows
    // (an empty build side collapses the whole plan to LocalTableScan)
    val df = SparkEntry.queries("q28_bloom_prune")(spark, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the bloom filter sits below the join in the plan tree; the semi
    // join itself is broadcast (no fact-table shuffle for the join)
    assert(p.contains("BroadcastHashJoin") && p.indexOf("Filter") > p.indexOf("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    // the membership test is the native codegen'd kernel, not a ScalaUDF
    // (a UDF would box every fact key and break the codegen span)
    assert(p.contains("bloom_might_contain"), p.take(1500))
    assert(!p.toLowerCase.contains("scalaudf") && !p.contains("UDF("), p.take(1500))
  }

  test("q29 partitioned write is pruned to one partition at the scan") {
    val p = plan("q29_partitioned_scan")
    assert(p.contains("PartitionFilters:") && p.contains("1-URGENT"), p.take(1500))
    // the data filter is satisfied by pruning alone — no row-level
    // o_orderpriority predicate survives into PushedFilters
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderpriority)"), p.take(1500))
  }

  test("d7 embedding LSH dedup joins on bucket equality (hash join, no cross product)") {
    val p = plan("d7_embed_lsh_pairs")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("x11b containment candidates come from hash joins (no all-pairs scan anywhere)") {
    // the operator materializes + persists internally; the cached
    // relation's plan subtree still prints, so the assertion covers the
    // candidate-generation joins too
    val df = SparkEntry.queries("x11b_containment_scale")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // positive assert first: the cached-relation subtree (where the
    // candidate joins live) must actually be visible in this string,
    // or the negative assert below would pass vacuously
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("x23/x27 share one memoized postings build (InMemoryRelation in x27's plan)") {
    // bm25TopK memoizes its persisted postings by (corpus, vocab):
    // after x23 runs, x27's lexical side must READ that cache, not
    // rebuild the corpus-pass subtree (round-10 postings sharing).
    graft.functions.SearchFunctions.releaseCaches()
    SparkEntry.queries("x23_bm25")(spark, d).count()
    val plan = SparkEntry.queries("x27_hybrid_rrf")(spark, d)
      .queryExecution.executedPlan.toString
    graft.functions.SearchFunctions.releaseCaches()
    assert(plan.contains("InMemoryTableScan") || plan.contains("InMemoryRelation"),
      plan.take(2000))
  }

  test("dedup verify attach builds the hashed-set relation once (ReusedExchange, non-AQE plan)") {
    // Both verify attaches reference ONE hashed-set plan
    // (DedupFunctions.attachVerifySets); with AQE off, Spark's
    // ReuseExchange rule must dedup the broadcast build. (Under AQE,
    // Spark 4.1.2 misses this reuse for every shape tried —
    // tools/ReuseRepro + SCALE.md round 10 — so the pin runs non-AQE,
    // where the shared-plan form is what MAKES reuse possible; the
    // r9 per-side renamed projections broke it in both modes.)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = graft.functions.DedupFunctions.containmentPairs(
        docs, "doc_id", "text", 3, 0.7)
      val planStr = p.queryExecution.executedPlan.toString
      p.unpersist(blocking = false)
      assert(planStr.contains("ReusedExchange"), planStr.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("jaccardPairs verify arm: auto bound broadcasts on a big heap; an explicit tiny cap forces SHUFFLE_HASH") {
    // pins resolveVerifyBroadcastBytes at both sides of the bound
    // (r15 item 6): default 0 resolves to maxMemory/4 -- far above
    // the fixture's hashed-set estimate, so the broadcast arm is
    // picked with NO flag; an explicit 1-byte cap must flip the SAME
    // pipeline to the shuffle-hash arm (and never to a sort-merge of
    // the candidate stream).
    import org.apache.spark.sql.functions._
    import graft.functions.DedupFunctions
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .filter(length(col("text")) >= 5).limit(200)
    assert(DedupFunctions.resolveVerifyBroadcastBytes(0L) >=
      Runtime.getRuntime.maxMemory() / 4 - 1)
    assert(DedupFunctions.resolveVerifyBroadcastBytes(123L) == 123L)
    def verifyJoins(bytes: Long): String = {
      val p = DedupFunctions.jaccardPairs(docs, "doc_id", "text",
        DedupFunctions.charShingles(_, 5), 0.4, broadcastVerifyBytes = bytes)
      val str = p.queryExecution.executedPlan.toString
      p.unpersist(blocking = false)
      str
    }
    DedupFunctions.clearVerifyStatCache()
    val auto = verifyJoins(0L)
    assert(auto.contains("BroadcastHashJoin"), auto.take(2000))
    DedupFunctions.clearVerifyStatCache()
    val tiny = verifyJoins(1L)
    assert(tiny.contains("ShuffledHashJoin"), tiny.take(2000))
    assert(!tiny.contains("SortMergeJoin"), tiny.take(2000))
  }

  test("d17 exact substring dedup: gram-keyed equi-joins only (no all-pairs scan, no cartesian)") {
    for (q <- Seq("d17_exact_substring", "d17b_exact_substring_hash")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q: " + p.take(2000))
    }
  }

  test("x18b winnowing pairs: inverted-index equi-join on the fingerprint key (no all-pairs scan)") {
    val p = plan("x18b_winnowing_pairs")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("d4b Jaccard candidates come from hash joins (no all-pairs scan anywhere)") {
    val df = SparkEntry.queries("d4b_ngram_jaccard_scale")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("d9 decontamination broadcasts the benchmark n-gram set (corpus probe is shuffle-free)") {
    val p = plan("d9_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("s5 kNN join is a bucket-equality join (no all-pairs scan)") {
    val p = plan("s5_knn_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("s16 batch IVF join keys on the cell id, reranks in the heap, never goes all-pairs") {
    val p = plan("s16_ann_batch_join")
    // the candidate join is cell-equality (Catalyst picks the
    // strategy — the code forces no broadcast of the query corpus)
    assert(p.contains("__cid"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    assert(p.contains("bounded_topk"), p.take(1500))
  }

  test("d8 span dedup shuffles only on span text and doc id (no join wider than the corpus)") {
    val p = plan("d8_span_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    // keep-first window partitions by the span text
    assert(p.contains("Window") && p.contains("__sp"), p.take(1500))
  }

  test("d11 semDedup: assignment is a per-row kernel (no nested loop anywhere); the dup scan joins on cluster id") {
    val df = SparkEntry.queries("d11_semdedup")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // assignment is a per-row nearest-centroid kernel — the round-5
    // crossJoin+window form is gone, so NO nested loop may appear; the
    // within-cluster pair scan must be an equality join on __cid — a
    // plain CartesianProduct anywhere means the cluster key was lost
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(2000))
  }

  test("s7 k-means assignment adds NO exchange: per-row kernel, no window, no join (corpus-sized plan)") {
    // the round-5 plan shuffled corpus×C scored rows through a
    // row_number window; the kernel form is one scan projection — the
    // only exchange left is the output sort's range partitioning
    val df = SparkEntry.queries("s7_kmeans_refine")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("nearest_centroids"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("hashpartitioning"), p.take(1500))
  }

  test("ANN rerank is a map-side bounded_topk heap aggregate, not a candidate-sized window shuffle") {
    // the round-5 plans ranked candidates with row_number().over(
    // partitionBy(query_id)) — shuffling EVERY candidate to discard
    // all but k; the heap aggregate combines map-side, so the rerank
    // exchange is k×partitions per query, independent of candidates
    for (q <- Seq("s1_ann_topk", "s2_ann_lsh", "s5_knn_join", "s4_ann_ivf",
      "s6_ann_pq", "s8_ann_ivfpq")) {
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"$q: ${p.take(800)}")
      assert(p.contains("bounded_topk"), s"$q: ${p.take(800)}")
    }
  }

  test("x19 LM scoring joins bigrams on equality keys and partitions the doc window (no global sort, no cross product)") {
    val df = SparkEntry.queries("x19_lm_perplexity")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the per-doc position window is partitioned (a global window would
    // print 'Window [' with an empty partition spec and warn)
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("hashpartitioning(__id"), p.take(2000))
  }

  test("q33 ORC round-trip pushes the key filter into the ORC scan") {
    val df = SparkEntry.queries("q33_orc_roundtrip")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("OrcScan") || p.contains("Format: orc") ||
      p.toLowerCase.contains("orc"), p.take(1500))
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThanOrEqual(l_orderkey,4000)]") ||
      p.contains("LessThanOrEqual(l_orderkey,4000)"), p.take(1500))
  }

  test("d12 bucketed assignment: bucket-equality join + hash-agg argmax (no window, no nested loop)") {
    val df = SparkEntry.queries("d12_bucketed_assign")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(1500))
  }

  test("x15 quality deciles: every window is partitioned (no data-sized single-partition funnel)") {
    val df = SparkEntry.queries("x15_quality_deciles")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // WindowExec prints `Window [exprs], [partitionSpec], [orderSpec]`;
    // an unpartitioned window drops the middle group — require every
    // Window line to carry all three
    val winLines = p.split("\n").filter(_.contains("Window ["))
    assert(winLines.nonEmpty, p.take(1200))
    winLines.foreach { l =>
      assert("\\], \\[".r.findAllIn(l).size >= 2, s"unpartitioned window: $l")
    }
  }

  test("multi-probe lshTopK keeps the broadcast bucket join (probe explode stays on the tiny query side)") {
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, d)
    val df = graft.functions.SimilarityFunctions.lshTopK(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, seed = 42L, planes = 4, dim = 64, probes = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the probe expansion multiplies QUERY rows (broadcast side), never
    // the corpus: the join must stay a broadcast hash join on the
    // bucket, with no nested loop and no corpus-side generate
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("residual ivfpqTopK still scans the corpus once (centroid attach is a broadcast, ADC tables broadcast)") {
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, d)
    val df = graft.functions.SimilarityFunctions.ivfpqTopK(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3,
      cells = 8, nprobe = 2, m = 4, codebook = 8, dim = 64, residual = true)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // residual mode adds the cell-centroid join INTO the corpus scan:
    // it must be broadcast (no corpus exchange for the attach), and the
    // corpus parquet may be read only once in the whole plan
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // the query side (5 rows, vec_id < 5 pushed to its scans) may
    // appear in several broadcast branches — what must NOT happen is a
    // second CORPUS-sized scan (one without the query filter): encode +
    // cell-assign + residual-attach all live in the single corpus pass
    // AQE's toString prints the plan twice (Final + Initial) — count
    // scans in the final section only
    val finalP = p.split("== Initial Plan ==").head
    val fileScans = finalP.split("FileScan").drop(1)
    val corpusScans = fileScans.count(s =>
      s.contains("embeddings.parquet") && !s.contains("LessThan(vec_id,5)"))
    assert(corpusScans == 1,
      s"expected exactly 1 unfiltered corpus scan, got $corpusScans:\n${p.take(2000)}")
  }

  test("d18/d18b fuzzy join: gram-keyed equi-joins only, no cartesian on the name relation") {
    for (q <- Seq("d18_fuzzy_join", "d18b_fuzzy_join_prefix")) {
      val p = plan(q)
      // band arm joins on gram value, prefix arm on (gram, occ), the
      // sub-threshold bucket on deletion-variant strings (FastSS) —
      // every candidate stage is a hash/merge equi-join; no nested
      // loop anywhere (the r16-advice brute arm's first cut was a
      // BNLJ over the bucket; the r17 review replaced it)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n${p.take(2000)}")
    }
  }

  test("x42 MMR: candidate sim matrix joins on qid (broadcast candidates), greedy is one project") {
    val p = plan("x42_mmr_diversify")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the rerank itself is a HOF fold in a Project over the packed
    // row — no per-step shuffle, no window over candidates
    assert(p.contains("bounded_topk"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("x23 BM25: query side broadcast, rerank is the bounded_topk heap (no window), no all-pairs scan") {
    val p = plan("x23_bm25")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("bounded_topk"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(1500))
    // the 1-row (N, avgdl) stats attach is the only nested-loop join
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(2000))
  }

  test("x31 sketch aggregate partially aggregates map-side (no distinct-expand shuffle)") {
    val p = plan("x31_distinct_sketch")
    // the KMV aggregate combines before the exchange — the whole point
    // vs count(DISTINCT), whose first exchange ships every distinct value
    assert(p.contains("partial_kmv_sketch"), p.take(1500))
    // one grouping exchange, not the distinct-expand double shuffle
    assert("Exchange hashpartitioning\\(o_orderpriority".r.findAllIn(p).size == 1,
      p.take(1500))
  }

  test("x31b sketch rollup broadcasts dims and merges sketches partially") {
    val p = plan("x31b_sketch_rollup")
    assert(p.contains("partial_kmv_merge"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("x40 quantile rollup: partial kll map-side, broadcast dims, no sort-merge join") {
    val p = plan("x40_quantile_rollup")
    // the KLL aggregate combines before the exchange — the whole point
    // vs percentile, whose per-group state is every VALUE
    assert(p.contains("partial_kll_sketch"), p.take(2000))
    assert(p.contains("partial_kll_merge"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("d8b span-dedup scale twin keeps-first via partial min aggregate, no window") {
    val p = plan("d8b_span_dedup_scale")
    // the whole point vs d8: no per-span window (whose hot-span group
    // a single task must sort) anywhere in the plan
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("partial_min"), p.take(1500))
  }

  test("x38 budget selection: windows only over the bucketed histogram, broadcast keep attach") {
    val p = plan("x38_budget_select")
    // every Window in the plan is partitioned by the coarse bucket —
    // the cumulative sum never sees corpus-sized, unpartitioned data
    val windows = "Window \\[".r.findAllIn(p).size
    val partitioned = "Window \\[[^\\]]*\\], \\[__bk".r.findAllIn(p).size
    assert(windows >= 1 && windows == partitioned, p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("whole-stage codegen covers the scan+filter+project pipeline") {
    // under AQE the codegen stage markers ("*(n)") appear once the
    // final plan has materialized — execute, then inspect
    val df = SparkEntry.queries("q10_filter_project")(spark, d)
    df.collect()   // count() would plan a separate query; execute THIS plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p.take(800))
  }

  test("persisted-ANN probe scan carries a static cell INSET partition filter (prunes unprobed cells)") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, d)
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_plan").toString
    graft.functions.AnnIndex.ivfIndexSave(
      e.filter(col("vec_id") < 250), "vec_id", "embedding", cells = 16, dir = dir)
    val probe = graft.functions.AnnIndex.probe(spark, dir,
      e.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5, nprobe = 2)
    val p = probe.queryExecution.executedPlan.toString
    // pruning must be STATIC (foldable isin -> PartitionFilters INSET);
    // if this pin breaks, a 100 TB probe reads the whole inverted file
    val scanLine = p.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("cell")).getOrElse("")
    assert(scanLine.contains("INSET") || scanLine.contains(" IN ("),
      s"probe codes scan lost its static partition filter:\n${p.take(2000)}")
    // 3 queries x nprobe 2 -> at most 6 distinct probed cells in the set
    // (Spark prints small sets as "IN (…)", larger ones as "INSET …")
    val inset = "(?:INSET ([0-9, ]+))|(?:IN \\(([0-9,]+)\\))".r
      .findFirstMatchIn(scanLine)
      .map(m => Option(m.group(1)).getOrElse(m.group(2)).split(",").length)
      .getOrElse(99)
    assert(inset <= 6, s"probe set wider than queries x nprobe: $scanLine")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("x47 learned quality scoring is one map pass: no hash exchange, no join, no UDF") {
    val p = plan("x47_quality_filter")
    // the weight vector rides as an array literal indexed per gram —
    // a join-shaped scoring pass here would shuffle the corpus
    assert(!p.contains("hashpartitioning"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.toLowerCase.contains("scalaudf") && !p.contains("UDF("), p.take(1500))
    // the only exchange is the output sort's range partitioning
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(1500))
  }

  test("x50/x50b blocklist passes: one map scan, no join, no UDF, P patterns in one walk") {
    for (q <- Seq("x50_keyword_blocklist", "x50b_keyword_words")) {
      val p = plan(q)
      // the term list rides inside the automaton / array literal —
      // a join-shaped tagging pass here would shuffle the corpus
      assert(!p.contains("hashpartitioning"), s"$q:\n${p.take(1500)}")
      assert(!p.contains("Join"), s"$q:\n${p.take(1500)}")
      assert(!p.toLowerCase.contains("scalaudf") && !p.contains("UDF("),
        s"$q:\n${p.take(1500)}")
      assert("Exchange".r.findAllIn(p).size <= 1, s"$q:\n${p.take(1500)}")
    }
    // the AC scan itself appears exactly once in the plan — P terms
    // never fan out into P scans
    assert("aho_corasick_counts".r.findAllIn(plan("x50_keyword_blocklist")).size == 1)
  }

  test("x51 collocations: TakeOrdered top-k (no global sort), totals broadcast, no cartesian on data") {
    val p = plan("x51_collocations")
    assert(p.contains("TakeOrdered"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the two grand totals ride as 1-row broadcast relations; the
    // only data-sized joins key on the unigram word
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1500))
  }

  test("x45b/x48/x49 web-curation projections: pure map passes, no join, no UDF") {
    for (q <- Seq("x45b_url_domain_psl", "x48_pii_redact", "x49_strip_html")) {
      val p = plan(q)
      // PSL membership is an InSet chain, PII/HTML are regexp chains —
      // none of them may shuffle or join the corpus
      assert(!p.contains("hashpartitioning"), s"$q:\n${p.take(1500)}")
      assert(!p.contains("Join"), s"$q:\n${p.take(1500)}")
      assert(!p.toLowerCase.contains("scalaudf") && !p.contains("UDF("),
        s"$q:\n${p.take(1500)}")
      assert("Exchange".r.findAllIn(p).size <= 1, s"$q:\n${p.take(1500)}")
    }
  }
}
