package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.DedupFunctions._

/** Empirical scale-growth measurement for the dedup pipelines — the
  * 100-TB story is plan-shape reasoning (banded/bucketed candidate
  * generation, shuffle ∝ corpus) PLUS this measurement: corpus grows
  * F×, wall-time and candidate counts must grow ~F×, not F².
  *
  * Corpus synthesis: replica c of the base corpus applies a
  * replica-specific alphabet rotation (`translate` by a Caesar shift,
  * spaces fixed), so each replica reproduces the base corpus's shingle
  * statistics and near-dup structure EXACTLY — a bijective remap of
  * the character alphabet is an isomorphism of BOTH the word-shingle
  * and the char-gram universe (same df skew, same Jaccard/containment
  * values) — while cross-replica shingle overlap is only the
  * coincidental overlap of differently-rotated English (near zero,
  * realistically nonzero). A corpus F× bigger with identical per-doc
  * statistics: the clean setting for a growth law. (Word-suffix and
  * hash-remap syntheses both fail here: suffixes inject corpus-wide
  * shared char-grams at word boundaries, hash tokens flatten the df
  * skew to uniform — each distorts the candidate-count law it's meant
  * to measure.) Replicas are written to parquet and read back so every
  * run scans real files, not in-memory lineage.
  *
  * Candidate counts are reconstructed from the same public building
  * blocks (wordShingles/charShingles, minhash_signature, bandKeys) and
  * the same bounds documented in DedupFunctions — the pipelines
  * themselves stay the oracle-pinned implementations.
  *
  * Run: `sbt "runMain graft.tools.ProfileScale /root/testdata/sf0.1 1,3,10"`
  * (append `--embeddings-only` to skip the text cells and measure just
  * the s5/d11/d12 embedding family; `--ops=d4b,d2` restricts to named
  * cells — the dial for single-family ×100 runs, where the untargeted
  * cells would dominate the wall clock). Results: SCALE.md. */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val embOnly = args.contains("--embeddings-only")
    // --phase=pipe|cand|both (default both): at ×100 the d4b cell's
    // pipeline AND its candidate reconstruction each spill tens of GB
    // of shuffle, and one app holds every finished stage's shuffle
    // files until the ContextCleaner reaps them — the r15 first
    // attempt filled the 80 GB sandbox disk mid-×100. Splitting the
    // two jobs into separate invocations bounds peak disk to one
    // job's footprint; --corpus= makes both read the SAME corpus.
    val phase = args.find(_.startsWith("--phase="))
      .map(_.stripPrefix("--phase=")).getOrElse("both")
    // a typo'd --phase used to silently run NEITHER phase and still
    // emit sentinel rows into the table (r15 advice) -- fail fast
    require(Set("pipe", "cand", "both")(phase),
      s"--phase must be pipe|cand|both, got '$phase'")
    val runPipe = phase == "both" || phase == "pipe"
    val runCand = phase == "both" || phase == "cand"
    val corpusRoot = args.find(_.startsWith("--corpus="))
      .map(_.stripPrefix("--corpus="))
    // the d4b verify dial (see jaccardPairs/attachVerifySets): at ×100
    // the 500k-doc hashed-set relation is ~1.1 GB — past the 256 MB
    // default the verify falls to SHUFFLE_HASH and the candidate
    // relation (~370M rows) carries ~2.3 KB of arrays per row through
    // an exchange: ~100s of GB of shuffle, more than this sandbox's
    // disk. On one 128 GiB node the right plan is the broadcast arm,
    // so the ×100 invocation raises the cap (and the heap, via
    // SPARK_DRIVER_MEM) instead of paying a cluster's distributed-disk
    // cost on one spindle.
    // default 0 = the operator's own auto dial (driver-heap/4 --
    // resolveVerifyBroadcastBytes): the x100 pipe phase runs green
    // with NO flag on a big-heap node; pass an explicit cap to pin
    // an arm for an A/B
    val verifyBytes = args.find(_.startsWith("--verify-bytes="))
      .map(_.stripPrefix("--verify-bytes=").toLong).getOrElse(0L)
    val shufParts = args.find(_.startsWith("--shuffle-parts="))
      .map(_.stripPrefix("--shuffle-parts=")).getOrElse("32")
    // zstd halves shuffle/spill bytes on this workload vs lz4 — the
    // disk-bound ×100 cells run under it (named in their SCALE.md rows)
    val codec = args.find(_.startsWith("--codec="))
      .map(_.stripPrefix("--codec=")).getOrElse("lz4")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.io.compression.codec", codec)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft_scale")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      if (Files.exists(tmp))
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }

    val famOnly = args.contains("--families-only")
    val opsArg = args.find(_.startsWith("--ops="))
      .map(_.stripPrefix("--ops=").split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def sel(op: String): Boolean = opsArg.forall(_.contains(op))
    val base = documents(spark, d).select("doc_id", "text", "source")
    val baseN = base.count()
    println(s"base corpus: $baseN docs ($d)")

    def corpusPath(f: Int): String = {
      val p = corpusRoot.map(r => s"$r/docs_x$f").getOrElse(s"$tmp/docs_x$f")
      // under --corpus= the replica synthesis is deterministic (seeded
      // permutations of a fixed base), so an existing dir IS the same
      // corpus — reuse it so split-phase invocations measure one corpus
      if (corpusRoot.isDefined &&
          java.nio.file.Files.exists(java.nio.file.Paths.get(p, "_SUCCESS")))
        return p
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val digits = "0123456789"
      // a seeded full PERMUTATION per replica, not a rotation: rotations
      // repeat with period 26, so past f=26 replicas collide into
      // identical copies and the "growth law" measures the synthesized
      // duplicate density, not the operator (observed at ×100: d2 pairs
      // 819k ≈ the ~715k cross-rotation-class identity pairs + the 25.6k
      // planted ones). A permutation is still a bijection on the
      // alphabet, so within-replica shingle-set relations — and every
      // planted pair's exact Jaccard — are preserved.
      def perm(s: String, seed: Int): String = {
        val r = new scala.util.Random(seed)
        r.shuffle(s.toList).mkString
      }
      val replicas = (0 until f).map { c =>
        if (c == 0) base
        else base.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper + digits,
            perm(lower, 3 * c + 1) + perm(upper, 3 * c + 2) +
              perm(digits, 3 * c + 3)).as("text"),
          col("source"))
      }
      replicas.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
      p
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    case class Cell(op: String, factor: Int, docs: Long,
                    secs: Double, candidates: Long, pairs: Long)
    val cells = scala.collection.mutable.ArrayBuffer[Cell]()

    // warm codegen/classloading/parquet paths once so the smallest
    // factor's timings don't carry first-call JVM cost
    {
      val w = base.limit(200)
      containmentPairs(w, "doc_id", "text", 3, 0.7).unpersist(blocking = false)
      minhashNearDuplicates(w, "doc_id", "text", 3, 64, 16, 0.8).unpersist(blocking = false)
      val jp = jaccardPairs(w, "doc_id", "text", charShingles(_, 5), 0.4)
      nearDupClusters(jp.select("a", "b")).unpersist(blocking = false)
      jp.unpersist(blocking = false)
    }

    for (f <- factors if !embOnly) {
      val docs = spark.read.parquet(corpusPath(f))
      val n = docs.count()
      println(s"\n== factor $f: $n docs ==")

      if (!famOnly) {
      // x11b — containment, prefix filter + PPJoin bound (threshold 0.7)
      if (sel("x11b")) {
        val input = docs.filter(size(split(col("text"), " ")) >= 3)
        val (pairs, t) = time {
          val p = containmentPairs(input, "doc_id", "text", 3, 0.7)
          val c = p.count(); p.unpersist(blocking = false); c
        }
        // candidate reconstruction: round-7 stage shape — slacked
        // per-row positional bound + group bound on the surviving
        // shared-prefix shingles (the agg doubles as the distinct)
        val cand = {
          import org.apache.spark.sql.expressions.Window
          val t0 = 0.7
          val sh = input.select(col("doc_id").as("__id"),
            array_sort(wordShingles(col("text"), 3)).as("__sh"))
          val tok = sh.select(col("__id"), size(col("__sh")).as("__na"),
            explode(col("__sh")).as("__s"))
          val dfreq = tok.groupBy("__s").agg(count(lit(1)).as("__df"))
          val ranked = tok.join(dfreq, Seq("__s"))
            .withColumn("__rn", row_number().over(
              Window.partitionBy("__id").orderBy(col("__df"), col("__s"))))
            .drop("__df")
          val prefix = ranked
            .filter(col("__rn") <= col("__na") - ceil(lit(t0) * col("__na") - lit(1e-9)) + 1)
            .select(col("__id").as("__pa"), col("__s"),
              col("__rn").as("__ra"), col("__na").as("__naa"))
          prefix.join(ranked.select(col("__id").as("__pb"), col("__s"),
              col("__rn").as("__rb"), col("__na").as("__nab")), Seq("__s"))
            .filter(col("__pa") =!= col("__pb") &&
              lit(1) + least(col("__naa") - col("__ra"), col("__nab") - col("__rb")) >=
                ceil(lit(t0) * col("__naa") - lit(1e-9)) -
                  ceil(lit(0.05) * col("__naa")))
            .groupBy("__pa", "__pb", "__naa", "__nab")
            .agg(count(lit(1)).as("__cnt"), max("__ra").as("__mra"), max("__rb").as("__mrb"))
            .filter(col("__cnt") +
                least(col("__naa") - col("__mra"), col("__nab") - col("__mrb")) >=
              ceil(lit(t0) * col("__naa") - lit(1e-9)))
            .count()
        }
        println(f"x11b  ${t}%7.1f s  candidates $cand%9d  pairs $pairs%7d")
        cells += Cell("x11b_containment", f, n, t, cand, pairs)
      }

      // d2 — MinHash(64) + LSH(16x4) at threshold 0.8
      if (sel("d2")) {
        val (res, t) = time {
          val p = minhashNearDuplicates(docs, "doc_id", "text", 3, 64, 16, 0.8)
          val c = p.count(); p.unpersist(blocking = false); c
        }
        val cand = {
          val banded = docs.select(col("doc_id").as("__id"),
              wordShingles(col("text"), 3).as("__sh"))
            .withColumn("__band", explode(bandKeys(
              graft.expressions.HashExpressions.minhash_signature(col("__sh"), 64),
              16, 4)))
            .select("__id", "__band")
          banded.as("x").join(banded.as("y"),
              col("x.__band") === col("y.__band") && col("x.__id") < col("y.__id"))
            .select(col("x.__id"), col("y.__id")).distinct().count()
        }
        println(f"d2    ${t}%7.1f s  candidates $cand%9d  pairs $res%7d")
        cells += Cell("d2_minhash_lsh", f, n, t, cand, res)
      }

      // d4b — char-5-gram Jaccard, prefix-prefix PPJoin at threshold 0.4
      if (sel("d4b")) {
        val input = docs.filter(length(col("text")) >= 5)
        val (pairs, t) = if (runPipe) time {
          val p = jaccardPairs(input, "doc_id", "text", charShingles(_, 5), 0.4,
            broadcastVerifyBytes = verifyBytes)
          val c = p.count(); p.unpersist(blocking = false); c
        } else (-1L, -1.0)
        // between the two shuffle-heavy jobs: drop dead references and
        // give the ContextCleaner a GC to reap finished shuffle files
        clearVerifyStatCache(); System.gc(); Thread.sleep(2000)
        val cand = if (!runCand) -1L else {
          import org.apache.spark.sql.expressions.Window
          val t0 = 0.4
          val tok = input.select(col("doc_id").as("__id"),
              array_sort(charShingles(col("text"), 5)).as("__sh"))
            .select(col("__id"), size(col("__sh")).as("__na"),
              explode(col("__sh")).as("__s"))
          val dfreq = tok.groupBy("__s").agg(count(lit(1)).as("__df"))
          // round-6 stage shape: index-prefix × standard-prefix join +
          // group positional bound on the last shared prefix shingle
          val prefix = tok.join(dfreq, Seq("__s"))
            .withColumn("__rn", row_number().over(
              Window.partitionBy("__id").orderBy(col("__df"), col("__s"))))
            .filter(col("__rn") <= col("__na") - ceil(lit(t0) * col("__na") - lit(1e-9)) + 1)
            .select(col("__id"), col("__s"), col("__rn"), col("__na"),
              (col("__rn") <= col("__na") -
                ceil(lit(2 * t0 / (1 + t0)) * col("__na") - lit(1e-9)) + 1).as("__ix"))
          prefix.filter(col("__ix")).drop("__ix").toDF("__pa", "__s", "__ra", "__naa")
            .join(prefix.drop("__ix").toDF("__pb", "__s", "__rb", "__nab"), Seq("__s"))
            .filter((col("__naa") < col("__nab") ||
                (col("__naa") === col("__nab") && col("__pa") < col("__pb"))) &&
              col("__nab") >= ceil(lit(t0) * col("__naa") - lit(1e-9)) &&
              col("__naa") >= ceil(lit(t0) * col("__nab") - lit(1e-9)) &&
              lit(1) + least(col("__naa") - col("__ra"), col("__nab") - col("__rb")) >=
                ceil(lit(t0 / (1 + t0)) * (col("__naa") + col("__nab")) - lit(1e-9)) -
                  ceil(lit(0.05) * (col("__naa") + col("__nab"))))
            .groupBy("__pa", "__pb", "__naa", "__nab")
            .agg(count(lit(1)).as("__cnt"), max("__ra").as("__mra"), max("__rb").as("__mrb"))
            .filter(col("__cnt") +
                least(col("__naa") - col("__mra"), col("__nab") - col("__mrb")) >=
              ceil(lit(t0 / (1 + t0)) * (col("__naa") + col("__nab")) - lit(1e-9)))
            .count()
        }
        println(f"d4b   ${t}%7.1f s  candidates $cand%9d  pairs $pairs%7d")
        cells += Cell("d4b_jaccard", f, n, t, cand, pairs)
      }

      // d6 — transitive clustering over the d2 pairs
      if (sel("d6")) {
        val p = minhashNearDuplicates(docs, "doc_id", "text", 3, 64, 16, 0.8)
        val (nc, t) = time {
          val labels = nearDupClusters(p.select("a", "b"))
          val c = labels.count(); labels.unpersist(blocking = false); c
        }
        p.unpersist(blocking = false)
        println(f"d6    ${t}%7.1f s  labeled nodes $nc%9d")
        cells += Cell("d6_clusters", f, n, t, -1L, nc)
      }

      // d8 — corpus-level span dedup: spans exploded ∝ corpus, one
      // keep-first window on span text. "candidates" = total spans.
      if (sel("d8")) {
        val (kept, t) = time {
          spanDedup(docs, "doc_id", "text", 10)
            .agg(sum("kept_spans")).collect()(0).getLong(0)
        }
        val spans = docs.select(
          ceil(size(split(col("text"), " ")).cast("double") / 10).cast("long").as("ns"))
          .agg(sum("ns")).collect()(0).getLong(0)
        println(f"d8    ${t}%7.1f s  spans $spans%9d  kept $kept%9d")
        cells += Cell("d8_span_dedup", f, n, t, spans, kept)
      }

      // x19 — self-trained bigram-LM perplexity: two hash aggs build
      // the LM, one bigram-keyed join scores. Work ∝ corpus tokens;
      // "candidates" = scored bigram positions.
      if (sel("x19")) {
        import graft.functions.TextAnalysisFunctions.lmPerplexity
        val (scored, t) = time {
          lmPerplexity(docs, "doc_id", "text", alpha = 0.5).count()
        }
        val grams = docs.filter(size(split(col("text"), " ")) >= 2)
          .select((size(split(col("text"), " ")) - 1).cast("long").as("ng"))
          .agg(sum("ng")).collect()(0).getLong(0)
        println(f"x19   ${t}%7.1f s  grams $grams%9d  scored docs $scored%7d")
        cells += Cell("x19_lm_perplexity", f, n, t, grams, scored)
      }

      // d9 — decontamination with a FIXED benchmark (the base replica's
      // % 50 slice — the realistic setting: the benchmark doesn't grow
      // with the corpus). Probe volume ∝ corpus grams, broadcast const.
      if (sel("d9")) {
        val bench = col("doc_id") < 10000000L && col("doc_id") % 50 === 0
        val (flagged, t) = time {
          decontaminate(docs, "doc_id", "text", bench, 3).count()
        }
        val grams = docs.filter(size(split(col("text"), " ")) >= 3)
          .select((size(split(col("text"), " ")) - 2).cast("long").as("ng"))
          .agg(sum("ng")).collect()(0).getLong(0)
        println(f"d9    ${t}%7.1f s  grams $grams%9d  flagged $flagged%7d")
        cells += Cell("d9_decontaminate", f, n, t, grams, flagged)
      }
      } // !famOnly

      // x31b — KMV distinct rollup, both halves of the claim:
      // (build) ONE corpus scan → per-source sketches → global
      // estimate, time ∝ corpus; (rollup) per-(source, shard)
      // sketches persisted to parquet — shards grow with the corpus
      // like daily ingest partitions — and the re-rollup reads ONLY
      // sketch rows, so its time follows sketch count, never corpus
      // bytes. "candidates" = sketch rows read.
      if (sel("x31b")) {
        import graft.expressions.SketchExpressions._
        val toks = docs
          .select(col("source"), col("doc_id"),
            explode(split(col("text"), " ")).as("__t"))
          .filter(col("__t") =!= "")
        val (est, t) = time {
          toks.groupBy("source").agg(kmv_sketch(col("__t"), 16384).as("sk"))
            .agg(kmv_estimate(kmv_merge(col("sk"))).as("d"))
            .collect()(0).getLong(0)
        }
        val skPath = s"$tmp/kmv_x$f"
        toks.withColumn("__shard", pmod(xxhash64(col("doc_id")), lit(16L * f)))
          .groupBy("source", "__shard")
          .agg(kmv_sketch(col("__t"), 16384).as("sk"))
          .write.mode("overwrite").parquet(skPath)
        val skRows = spark.read.parquet(skPath).count()
        val (est2, t2) = time {
          spark.read.parquet(skPath)
            .agg(kmv_estimate(kmv_merge(col("sk"))).as("d"))
            .collect()(0).getLong(0)
        }
        assert(est == est2, s"rollup estimate drifted: $est vs $est2")
        println(f"x31b  build ${t}%6.1f s  rollup ${t2}%6.2f s  sketches $skRows%6d  distinct $est%9d")
        cells += Cell("x31b_sketch_build", f, n, t, skRows, est)
        cells += Cell("x31b_sketch_rollup", f, n, t2, skRows, est2)
      }

      // x33b — the same two-level claim for Misra-Gries frequency
      // sketches: global top-1 token count from merged per-shard
      // sketches, rollup reading sketch rows only.
      if (sel("x33b")) {
        import graft.expressions.FreqSketchExpressions._
        val toks = docs
          .select(col("source"), col("doc_id"),
            explode(split(col("text"), " ")).as("__t"))
          .filter(col("__t") =!= "")
        val mgPath = s"$tmp/mg_x$f"
        toks.withColumn("__shard", pmod(xxhash64(col("doc_id")), lit(16L * f)))
          .groupBy("source", "__shard")
          .agg(mg_sketch(col("__t"), 4096).as("sk"))
          .write.mode("overwrite").parquet(mgPath)
        val mgRows = spark.read.parquet(mgPath).count()
        val (top, t2) = time {
          spark.read.parquet(mgPath)
            .agg(mg_merge(col("sk")).as("sk"))
            .select(explode(mg_topk(col("sk"), 1)).as("e"))
            .select(col("e.count")).collect()(0).getLong(0)
        }
        println(f"x33b  rollup ${t2}%6.2f s  sketches $mgRows%6d  top-count $top%9d")
        cells += Cell("x33b_mg_rollup", f, n, t2, mgRows, top)
      }

      // x38 — token-budget selection with the budget scaled ∝ corpus
      // (constant keep fraction): one scoring scan + the bounded
      // distinct-score histogram (candidates = its row count — must
      // stay ~flat while the corpus grows) + broadcast keep attach.
      if (sel("x38")) {
        import graft.functions.CurationFunctions.selectByTokenBudget
        val (kept, t) = time {
          selectByTokenBudget(docs, "doc_id", "text", budgetTokens = 20000L * f)
            .filter(col("keep") === 1).count()
        }
        val histRows = docs.select(
          round(graft.functions.TextAnalysisFunctions.qualityScore(col("text")), 6).as("q"))
          .distinct().count()
        println(f"x38   ${t}%7.1f s  hist rows $histRows%9d  kept $kept%7d")
        cells += Cell("x38_budget_select", f, n, t, histRows, kept)
      }

      // x39 kernel — image near-dup over REAL decoded aHashes, with
      // the payload synthesis OUT of the timed region (8×8 BMPs whose
      // 192 pixel bytes are sha256-derived per doc — uniformly spread
      // hashes, the adversarial no-dup-structure case for banding).
      // Measured at bands = 8 (the fixture default, hamming ≤ 7,
      // 2⁸ buckets/band) AND bands = 4 (the at-scale dial, hamming
      // ≤ 3, 2¹⁶ buckets/band): candidates = Σ_band Σ_bucket c(c−1)/2
      // — the 8-band law is ~n²/2⁸ by construction and the 4-band law
      // cuts it by ~2⁸ more, which is the point of the dial.
      if (sel("x39")) {
        import graft.functions.MultimodalFunctions.ahashNearDuplicates
        val hdrHex = "424DF600000000000000360000002800000008000000" +
          "080000000100180000000000C0000000" + "00" * 16
        val pixels = concat_ws("", transform(sequence(lit(0), lit(5)),
          c => sha2(concat(col("doc_id").cast("string"), lit(":"),
            c.cast("string")), 256)))
        val pp = s"$tmp/img_x$f"
        docs.select(col("doc_id"),
            unhex(concat(lit(hdrHex), pixels)).as("payload"))
          .write.mode("overwrite").parquet(pp)
        val imgs = spark.read.parquet(pp)
        for (bands <- Seq(8, 4)) {
          val (pairs, t) = time {
            ahashNearDuplicates(imgs, "doc_id", "payload",
              maxHamming = bands - 1, bands = bands).count()
          }
          val width = 64 / bands
          val cand = {
            val h = imgs.select(graft.expressions.MediaExpressions
              .image_ahash64(col("payload")).as("__h"))
              .filter(col("__h").isNotNull)
              .withColumn("__b", explode(sequence(lit(0), lit(bands - 1))))
              .withColumn("__bv",
                expr(s"shiftright(__h, ($bands - 1 - __b) * $width) & ${(1L << width) - 1}"))
            h.groupBy("__b", "__bv").agg(count(lit(1)).as("c"))
              .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")))
              .collect()(0).getLong(0)
          }
          println(f"x39 bands=$bands ${t}%7.1f s  candidates $cand%9d  pairs $pairs%7d")
          cells += Cell(s"x39_neardup_b$bands", f, n, t, cand, pairs)
        }
      }
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(2000)
    }

    if (!famOnly)
    // s5 — kNN join: candidates ∝ corpus²/2^planes, so the documented
    // dial is planes ~ log₂(corpus): grow the corpus F× AND add
    // ⌈log₂F⌉ planes, and candidate counts must stay ~linear (with
    // fixed planes they'd grow F²). Embedding replicas: vec_id offset
    // + a replica-specific sign flip — an isometry, so per-replica
    // geometry is exactly the base corpus's while cross-replica
    // vectors land in fresh buckets. The flip pattern is a hash of
    // (replica, dim), NOT a modular shift: `(j + c) % 3` repeats with
    // period 3, so past f=3 replicas would collide into identical
    // copies and inflate candidates with synthesized duplicates (the
    // same defect the text corpusPath fixed for rotations at f>26).
    {
      import graft.functions.SimilarityFunctions.{knnJoin, lshBucket}
      val ebase = embeddings(spark, d).select("vec_id", "embedding")
      val en = ebase.count()
      for (f <- factors if sel("s5") || sel("d11") || sel("d12")) {
        val reps = (0 until f).map { c =>
          if (c == 0) ebase
          else ebase.select((col("vec_id") + lit(c * 10000000L)).as("vec_id"),
            transform(col("embedding"),
              (x, j) => when(pmod(hash(lit(c), j), lit(2)) === 0, -x)
                .otherwise(x)).as("embedding"))
        }
        val p = s"$tmp/emb_x$f"
        reps.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
        val e = spark.read.parquet(p)
        if (sel("s5")) {
          val planes = 6 + (math.log(f.toDouble) / math.log(2.0)).ceil.toInt
          val (rows, t) = time {
            knnJoin(e, "vec_id", "embedding", k = 3, seed = 42L,
              planes = planes, dim = 64).count()
          }
          val cand = {
            val b = e.select(col("vec_id").as("__id"),
              lshBucket(col("embedding"), 42L, planes, 64).as("__b"))
            b.groupBy("__b").agg(count(lit(1)).as("c"))
              .agg(sum(col("c") * (col("c") - 1))).collect()(0).getLong(0)
          }
          println(f"s5 f=$f planes=$planes ${t}%7.1f s  candidates $cand%9d  rows $rows%7d")
          cells += Cell("s5_knn_join", f, en * f, t, cand, rows)
        }

        // d11 — SemDeDup with the documented linear dial C ∝ corpus:
        // cluster count grows with the factor, so cluster sizes (and
        // with them the within-cluster pair scan, candidates =
        // Σ c·(c−1)/2) stay ~constant per vector. Timed end-to-end on
        // the persisted output; dups/candidates read from it.
        if (sel("d11")) {
          import graft.functions.SimilarityFunctions.semDedup
          val cSem = 16 * f
          val out = semDedup(e, "vec_id", "embedding", cSem, 0.35)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val (nv, t2) = time { out.count() }
          val dups = out.filter(col("is_dup")).count()
          val cand2 = out.groupBy("cluster").agg(count(lit(1)).as("c"))
            .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")))
            .collect()(0).getLong(0)
          out.unpersist(blocking = false)
          println(f"d11 f=$f C=$cSem ${t2}%7.1f s  candidates $cand2%9d  dups $dups%7d  ($nv vectors)")
          cells += Cell("d11_semdedup", f, en * f, t2, cand2, dups)
        }

        // d12 — SemDeDup through the BUCKETED (large-C) assignment
        // path, end-to-end: same linear dial C ∝ corpus, and the
        // bucket dial 2^planes ≈ C/8 keeps ~8 centroids per bucket as
        // both grow — buckets must stay MUCH FEWER than centroids so
        // every vector's bucket holds candidate centroids (coverage
        // ~1, pruning factor 2^planes vs the dense C-dot scan); a
        // 2^planes ≥ C dial inverts the regime and routes most of the
        // corpus through the dense fallback. The dense path's growth
        // law is d11's row; this one measures the path real
        // deployments take once C leaves broadcast range.
        // "candidates" = the same within-cluster pair volume; the
        // residual count (vectors whose bucket held no centroid,
        // re-derived from the public lshBucket) is the dense-fallback
        // volume — it must stay a sliver for the path to be honest.
        if (sel("d12")) {
          import graft.functions.SimilarityFunctions.{semDedup, lshBucket}
          val cSem = 16 * f
          val planesB = math.max(1,
            (math.log(cSem.toDouble) / math.log(2.0)).floor.toInt - 3)
          val out = semDedup(e, "vec_id", "embedding", cSem, 0.35,
              assignPlanes = Some(planesB))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val (nv, t3) = time { out.count() }
          val dups = out.filter(col("is_dup")).count()
          val cand3 = out.groupBy("cluster").agg(count(lit(1)).as("c"))
            .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")))
            .collect()(0).getLong(0)
          val vb = e.select(col("vec_id"),
            lshBucket(col("embedding").cast("array<double>"), 42L, planesB, 64).as("__b"))
          val resid = vb.join(
            vb.filter(col("vec_id") < cSem).select("__b").distinct(),
            Seq("__b"), "left_anti").count()
          out.unpersist(blocking = false)
          println(f"d12 f=$f C=$cSem planes=$planesB ${t3}%7.1f s  candidates $cand3%9d  dups $dups%7d  residual $resid%7d  ($nv vectors)")
          cells += Cell("d12_bucketed_semdedup", f, en * f, t3, cand3, dups)
        }
      }
    }

    // skipped-phase fields print EMPTY, never a -1 a downstream
    // aggregation could mistake for a measurement (r15 advice)
    def fmtL(v: Long) = if (v < 0) "" else v.toString
    def fmtS(v: Double) = if (v < 0) "" else f"$v%.1f"
    println("\nop,factor,docs,secs,candidates,pairs")
    cells.foreach(c => println(
      s"${c.op},${c.factor},${c.docs},${fmtS(c.secs)},${fmtL(c.candidates)},${fmtL(c.pairs)}"))
    // growth ratios vs the smallest factor
    val byOp = cells.groupBy(_.op)
    println("\nop: time and candidate growth vs corpus growth")
    byOp.toSeq.sortBy(_._1).foreach { case (op, cs) =>
      val s = cs.sortBy(_.factor)
      val b = s.head
      s.tail.foreach { c =>
        val fx = c.docs.toDouble / b.docs
        val tx = if (b.secs > 0 && c.secs >= 0) f"${c.secs / b.secs}%5.1fx" else "    -"
        val cx = if (b.candidates > 0 && c.candidates >= 0)
          f"${c.candidates.toDouble / b.candidates}%5.1fx" else "    -"
        println(f"$op%-18s corpus ${fx}%5.1fx  time $tx  candidates $cx")
      }
    }
    spark.stop()
  }
}
