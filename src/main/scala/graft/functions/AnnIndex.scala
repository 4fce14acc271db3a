package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index: the production 100-TB retrieval shape, where
  * the index is built ONCE, saved, and probed (and grown) by later
  * sessions — the reference has no vector surface at all; this
  * extends the parity-plus ANN family (SimilarityFunctions) the same
  * way dedup already has incremental paths (d10 bloom, d13 band-index
  * probe).
  *
  * Layout under `dir` (all parquet):
  *   meta/      one row: kind ("ivf_flat" | "ivf_pq"), cells, m,
  *              codebook, dim, residual
  *   centroids/ (cid, vec)           — coarse cell centroids, KB-sized
  *   codebook/  (cid, vec)           — PQ seeds (residualized when
  *              residual = true), ivf_pq only, KB-sized
  *   codes/     the DATA-sized inverted file, partitioned BY CELL:
  *              ivf_flat: (id, vec) under cell=…/
  *              ivf_pq:   (id, b, code) under cell=…/
  *   vectors/   (id, vec) under cell=…/ — optional raw-vector sidecar
  *              (ivf_pq with keepVectors = true): never probed, it is
  *              what makes resplitCell legal on a lossy-code layout
  *
  * Scale design: centroids/codebook are the KB driver readback every
  * ANN path already does (SimilarityFunctions.collectCentroids); the
  * codes table is corpus-sized and NEVER collected — `partitionBy
  * (cell)` means a probe reads only the nprobe/cells fraction of it
  * (the probed-cell list is a queries×nprobe KB readback that prunes
  * the scan statically), and [[addBatch]] appends new cell
  * directories without touching existing ones. Probing reuses the
  * EXACT in-session kernels (ivfProbeAssigned / ivfpqProbeCodes), so
  * a saved-then-loaded index returns bit-identical rows to
  * ivfTopK/ivfpqTopK on the same corpus — the s10 queries pin that
  * against the s4/s8 oracles, and vectors are stored in their
  * original element type so scoring survives the round-trip exactly.
  */
object AnnIndex {

  import SimilarityFunctions._

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  /** Build an IVF-flat index from `corpus` (centroids = the first
    * `cells` corpus vectors, the deterministic convention shared with
    * ivfTopK) and save it under `dir`, replacing any prior index.
    *
    * `trainIters > 0` tightens the first-C seeds with that many
    * distributed Lloyd k-means steps before assignment
    * ([[SimilarityFunctions.trainedCentroids]] — integer-micro sums,
    * deterministic at any parallelism, so the s18 oracle replays the
    * unrolled iterations exactly). Trained centroids buy recall per
    * nprobe over the raw first-C convention: the seeds are arbitrary
    * corpus points, so cell populations are whatever the data order
    * gives, while Lloyd moves centroids toward the corpus's actual
    * density modes — the s12-style A/B in SimilaritySpec quantifies
    * the gap. Each step costs one corpus scan (per-row assignment
    * kernel, no exchange) + one map-side-combined C·dim agg; cells
    * that empty out during training drop (fewer, fuller cells). */
  def ivfIndexSave(corpus: DataFrame, idCol: String, vecCol: String,
                   cells: Int, dir: String, trainIters: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val cent =
      if (trainIters > 0)
        trainedCentroids(corpus, idCol, vecCol, cells, trainIters)
      else
        collectCentroids(corpus, idCol, vecCol, cells)
          .map { case (cid, v) => (cid, v.toArray) }
    writeMeta(spark, dir, "ivf_flat", cells, 0, 0, 0, residual = false,
      keepVectors = false)
    writeCentroids(spark, s"$dir/centroids", cent.map { case (c, v) => (c, v.toSeq) })
    ivfAssign(corpus, idCol, vecCol, cent)
      .select(col("neighbor_id").as("id"), col("__cv").as("vec"),
        col("__cid").as("cell"))
      // cluster by cell before the partitioned write: one writer (and
      // one file) per cell instead of tasks × cells small files; at
      // real scale spark.sql.files.maxRecordsPerFile bounds file size
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    // tombstones cleared LAST: a crash before this line leaves the
    // NEW store over-masked by the old generation's tombstones (the
    // retried save clears them) — fails closed; clearing first would
    // leave a crash window where the OLD store serves with its
    // right-to-erasure deletions silently resurrected (review r17)
    clearTombstones(spark, dir)
  }

  /** Build an IVF-PQ index (optionally residual-quantized) and save it
    * under `dir`, replacing any prior index. Conventions match
    * ivfpqTopK: cells/codebook seeds are the first-C corpus vectors.
    *
    * `keepVectors = true` additionally stores the RAW vectors as a
    * cell-partitioned sidecar (`vectors/`, same layout as the ivf_flat
    * codes table) — the storage-for-operability trade that makes
    * [[resplitCell]] legal on a PQ index: PQ codes are lossy, so
    * re-splitting a hot cell needs its source vectors, and without the
    * sidecar the only remedy for skew is a full rebuild from the
    * source-of-truth corpus. The sidecar is ingest-maintained
    * ([[addBatch]]/[[addBatchTagged]] append to it) and never read by
    * probes. */
  def ivfpqIndexSave(corpus: DataFrame, idCol: String, vecCol: String,
                     cells: Int, m: Int, codebook: Int, dim: Int,
                     residual: Boolean, dir: String,
                     keepVectors: Boolean = false,
                     trainIters: Int = 0): Unit = {
    val spark = corpus.sparkSession
    // trainIters > 0: coarse cells tightened by distributed Lloyd
    // (the ivfIndexSave arm, same integer-micro determinism — s18b
    // gates the lossy layout's trained twin; in residual mode the
    // codebook seeds residualize against the TRAINED cells)
    val cellCent =
      if (trainIters > 0)
        trainedCentroids(corpus, idCol, vecCol, cells, trainIters)
      else
        collectCentroids(corpus, idCol, vecCol, cells)
          .map { case (cid, v) => (cid, v.toArray) }
    val codeSeeds = ivfpqCodeSeeds(
      collectCentroids(corpus, idCol, vecCol, codebook), cellCent, residual)
    writeMeta(spark, dir, "ivf_pq", cells, m, codeSeeds.size, dim, residual,
      keepVectors)
    writeCentroids(spark, dir + "/centroids", cellCent.map { case (c, v) => (c, v.toSeq) })
    writeCentroids(spark, dir + "/codebook", codeSeeds)
    ivfpqEncode(corpus, idCol, vecCol, cellCent, codeSeeds, m, dim, residual)
      .select(col("neighbor_id").as("id"), col("__b").as("b"),
        col("__cid").as("code"), col("__cell").as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    if (keepVectors)
      ivfAssign(corpus, idCol, vecCol, cellCent)
        .select(col("neighbor_id").as("id"), col("__cv").as("vec"),
          col("__cid").as("cell"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/vectors")
    clearTombstones(spark, dir) // LAST — the ivfIndexSave fails-closed note
  }

  /** The shared encode half of the ingest paths: the batch encoded
    * against the SAVED centroids/codebook (no rebuild, no re-read of
    * existing codes), as (id, …, cell) rows ready for a partitioned
    * write. */
  private def encodeBatch(spark: SparkSession, dir: String, batch: DataFrame,
                          idCol: String, vecCol: String): DataFrame = {
    val meta = readMeta(spark, dir)
    val cellCent = readCentroids(spark, s"$dir/centroids")
    meta.kind match {
      case "ivf_flat" =>
        ivfAssign(batch, idCol, vecCol, cellCent)
          .select(col("neighbor_id").as("id"), col("__cv").as("vec"),
            col("__cid").as("cell"))
      case "ivf_pq" =>
        val codeSeeds = readCentroids(spark, s"$dir/codebook")
          .map { case (c, v) => (c, v.toSeq) }
        ivfpqEncode(batch, idCol, vecCol, cellCent, codeSeeds,
          meta.m, meta.dim, meta.residual)
          .select(col("neighbor_id").as("id"), col("__b").as("b"),
            col("__cid").as("code"), col("__cell").as("cell"))
    }
  }

  /** Encode a delta batch against the SAVED centroids/codebook (no
    * rebuild, no re-read of existing codes) and append it to the
    * inverted file — the incremental-ingest path. The batch must not
    * repeat ids already indexed (same contract as any append-only
    * store; dedup upstream with d10/d13 if ingest can replay). For a
    * source that RETRIES batches (Structured Streaming foreachBatch),
    * use [[addBatchTagged]], whose replay converges to exactly one
    * copy. */
  def addBatch(spark: SparkSession, dir: String, batch: DataFrame,
               idCol: String, vecCol: String): Unit = {
    // heal BEFORE writing: a compact crash mid-swap leaves cell=X only
    // as .old-X, and an append would recreate a live cell=X holding
    // just the new rows — the next read-side recovery would then drop
    // .old-X and every pre-compaction vector of that cell with it
    recoverMaintenance(spark, dir, sweepRetired = true)
    encodeBatch(spark, dir, batch, idCol, vecCol)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
    if (readMeta(spark, dir).keepVectors)
      assignedVectors(spark, dir, batch, idCol, vecCol)
        .repartition(col("cell"))
        .write.mode("append").partitionBy("cell").parquet(s"$dir/vectors")
  }

  /** The raw-vector sidecar rows of a batch — same cell assignment as
    * the codes (shared nearest-centroid kernel and convention). */
  private def assignedVectors(spark: SparkSession, dir: String, batch: DataFrame,
                              idCol: String, vecCol: String): DataFrame = {
    val cellCent = readCentroids(spark, s"$dir/centroids")
    ivfAssign(batch, idCol, vecCol, cellCent)
      .select(col("neighbor_id").as("id"), col("__cv").as("vec"),
        col("__cid").as("cell"))
  }

  /** Replay-idempotent addBatch: the encoded batch is staged under
    * `dir/.staging-<tag>`, then each file is MOVED into its cell
    * directory under the deterministic name `<tag>-<i>.parquet`
    * (rename is atomic per file). Re-running with the same tag first
    * scrubs every `<tag>-*` file from the cell dirs — the leftovers of
    * a crashed prior attempt — so any number of replays converges to
    * exactly one copy of the batch, no matter where the previous
    * attempt died. This is what makes [[graft.streaming.StreamOps
    * .vectorIngest]]'s exactly-once claim true across crashes in the
    * append-to-marker window, not just across clean replays. */
  def addBatchTagged(spark: SparkSession, dir: String, batch: DataFrame,
                     idCol: String, vecCol: String, tag: String): Unit = {
    require(tag.matches("[A-Za-z0-9_-]+"), s"tag must be a safe file prefix: $tag")
    // same live-dir-recreation hazard as addBatch
    recoverMaintenance(spark, dir, sweepRetired = true)
    val conf = spark.sparkContext.hadoopConfiguration
    val codes = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val staging = new org.apache.hadoop.fs.Path(s"$dir/.staging-$tag")
    val fs = codes.getFileSystem(conf)
    PartitionedStore.scrubTag(fs, codes, "cell", tag)
    encodeBatch(spark, dir, batch, idCol, vecCol)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    PartitionedStore.moveStagedTagged(fs, staging, codes, "cell", tag)
    if (readMeta(spark, dir).keepVectors) {
      // the sidecar replays under the same tag: a crash between the
      // codes move above and this one heals on the next retry (scrub
      // is per-store, rename names deterministic)
      val vecs = new org.apache.hadoop.fs.Path(s"$dir/vectors")
      val vecStaging = new org.apache.hadoop.fs.Path(s"$dir/.staging-vec-$tag")
      PartitionedStore.scrubTag(fs, vecs, "cell", tag)
      assignedVectors(spark, dir, batch, idCol, vecCol)
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(vecStaging.toString)
      PartitionedStore.moveStagedTagged(fs, vecStaging, vecs, "cell", tag)
    }
  }

  /** Probe a saved index: top-k per query row, bit-identical to the
    * in-session ivfTopK/ivfpqTopK on the indexed corpus. Only the
    * probed cells' partitions of the inverted file are read — AND only
    * they are listed ([[PartitionedStore.prunedRead]]): probe cost,
    * planning included, follows the probe set, never the index size. */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
            idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    probeImpl(spark, dir, queries, idCol, vecCol, k, nprobe, identity)

  /** Query-time FILTERED probe over a fixed index — the production
    * "filtered vector search" shape (one index serves every attribute
    * constraint): exact top-k among `allowed` ∩ the probed cells'
    * members. The constraint is a semi-join on the stored id applied
    * INSIDE the pruned cell scan, before any distance work
    * (pre-filtering) — so k stays filled however selective the
    * predicate, where post-filtering an unfiltered top-k under-fills
    * and re-probes. Cost: the semi-join touches only probed-cell
    * rows; Catalyst broadcasts a small allowed set and shuffles a
    * large one — never corpus-wide either way. */
  def probeFiltered(spark: SparkSession, dir: String, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int, nprobe: Int,
                    allowed: DataFrame, allowedIdCol: String): DataFrame = {
    val rel = allowed.select(col(allowedIdCol).as("neighbor_id")).distinct()
    probeImpl(spark, dir, queries, idCol, vecCol, k, nprobe,
      df => df.join(rel, Seq("neighbor_id"), "left_semi"))
  }

  private def probeImpl(spark: SparkSession, dir: String, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int, nprobe: Int,
                        restrict: DataFrame => DataFrame): DataFrame = {
    readEntry(spark, dir)
    val meta = readMeta(spark, dir)
    val cellCent = readCentroids(spark, s"$dir/centroids")
    // tombstone mask FIRST (deleted rows must be invisible to every
    // probe shape, filtered included), then the caller's restrict;
    // both are pre-filters inside the pruned cell scan
    val mask: DataFrame => DataFrame = readTombstones(spark, dir) match {
      case Some(t) => df =>
        restrict(df.join(t, df("neighbor_id") === t("__tomb_id"), "left_anti"))
      case None => restrict
    }
    val probedCells = probeCells(queries, idCol, vecCol, cellCent, nprobe)
    meta.kind match {
      case "ivf_flat" =>
        val assigned = mask(PartitionedStore
          .prunedRead(spark, s"$dir/codes", "cell", probedCells)
          .select(col("id").as("neighbor_id"), col("vec").as("__cv"),
            col("cell").cast("long").as("__cid")))
        ivfProbeAssigned(assigned, queries, idCol, vecCol, cellCent, k, nprobe)
      case "ivf_pq" =>
        val codeSeeds = readCentroids(spark, s"$dir/codebook")
          .map { case (c, v) => (c, v.toSeq) }
        val codes = mask(PartitionedStore
          .prunedRead(spark, s"$dir/codes", "cell", probedCells)
          .select(col("id").as("neighbor_id"), col("cell").cast("long").as("__cell"),
            col("b").as("__b"), col("code").as("__cid")))
        ivfpqProbeCodes(codes, queries, idCol, vecCol, cellCent, codeSeeds,
          k, nprobe, meta.m, meta.dim, meta.residual)
    }
  }

  /** Per-cell footprint of a saved index WITHOUT scanning data pages:
    * row counts come straight from parquet FOOTERS over the file list
    * the partition-dir listing yields ([[PartitionedStore
    * .footerCounts]] — one flat Spark job, so stats planning never
    * pays the whole-store partition-DISCOVERY job a full-tree
    * `spark.read.parquet` launches past 32 partitions), byte/file
    * counts from the same filesystem listing (driver-side metadata
    * plane, the same class as Hive partition listing — KB per cell,
    * never corpus-sized). This is the skew report that tells an
    * operator which cells [[addBatch]] has grown past their neighbors
    * and [[resplitCell]] should split. */
  def indexStats(spark: SparkSession, dir: String): DataFrame = {
    readEntry(spark, dir)
    import spark.implicits._
    // ivf_pq stores m code rows per vector — report VECTORS, not rows
    // (still footer-count-only: rows / m is exact, no distinct needed)
    val meta = readMeta(spark, dir)
    val perVec = if (meta.kind == "ivf_pq") meta.m.toLong else 1L
    val root = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // read path: IGNORE (don't sweep) dirs retired by a resplit — see
    // recoverMaintenance; a cell parked in `.old-` by a crashed or
    // in-flight compact is listed THROUGH its backup (readPartitions),
    // never restored; the centroid read is the KB pull every probe
    // already does
    val liveCids = readCentroids(spark, s"$dir/centroids").map(_._1).toSet
    val fsRows = PartitionedStore.readPartitions(fs, root, "cell")
      .map { case (v, pd) =>
        val cid = v.toLong
        val files = fs.listStatus(pd)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        (cid, files.map(_.getPath.toString), files.length.toLong,
          files.map(_.getLen).sum)
      }
      .filter { case (cid, _, _, _) => liveCids.contains(cid) }
    // row counts from parquet FOOTERS over the exact file list above —
    // one flat Spark job, no partition-discovery listing job no matter
    // how many cells the store has grown (PartitionedStore.footerCounts)
    val counts = PartitionedStore.footerCounts(spark,
      fsRows.flatMap { case (cid, files, _, _) => files.map((cid.toString, _)) })
    fsRows
      .map { case (cid, _, nFiles, bytes) =>
        (cid, counts.getOrElse(cid.toString, 0L) / perVec, nFiles, bytes)
      }
      .toDF("cell", "n_vectors", "n_files", "bytes")
      .orderBy("cell")
  }

  /** Split one over-grown cell into `k` sub-cells — the maintenance
    * path for [[addBatch]] skew: hot cells otherwise grow without
    * bound and probe cost follows the hottest cell, not the corpus.
    * Sub-centroid seeds are the cell's first `k` members by id (the
    * same deterministic first-C convention as collectCentroids); the
    * new cells take ids max(cid)+1 … +k in seed order, the old cell id
    * retires. Only the split cell's partitions are read
    * (partition-pruned) and rewritten; every other partition — and
    * therefore every probe that does not rank the split/new centroids
    * into its nprobe set — is untouched (SimilaritySpec pins
    * bit-identical probes for unchanged probe sets).
    *
    * ivf_flat splits from the codes table itself (it stores raw
    * vectors). ivf_pq needs the `keepVectors` sidecar: PQ codes are
    * lossy, so the cell's source vectors are read from `vectors/`,
    * re-encoded against the FIXED stored codebook with the sub-cells
    * as the assignment set (in residual mode the new codes quantize
    * v − subcentroid, exactly what [[SimilarityFunctions.ivfpqEncode]]
    * produces), and both stores' partitions are rewritten. A PQ index
    * saved without the sidecar is rejected — its only skew remedy is
    * a rebuild from the source corpus.
    *
    * Single-writer maintenance op (same contract as addBatch): the new
    * partitions land before the centroid swap and the old directories
    * are removed last, so a crash mid-op leaves a probe-able index
    * whose worst case is the split cell present twice on disk (never
    * in a probe: the probe scan is pruned to centroid-listed cells) —
    * and the next entry point's [[recoverMaintenance]] sweeps
    * whichever copy the centroids no longer name, so the double-count
    * is not permanent either. */
  def resplitCell(spark: SparkSession, dir: String, cid: Long, k: Int): Unit = {
    // writes cell dirs -> same hazard as addBatch
    recoverMaintenance(spark, dir, sweepRetired = true)
    val meta = readMeta(spark, dir)
    require(meta.kind == "ivf_flat" || meta.keepVectors,
      "resplitCell needs raw vectors: ivf_flat stores them in the codes " +
        "table, ivf_pq only with keepVectors = true (PQ codes are lossy) — " +
        "without the sidecar, re-split by rebuilding from the source corpus")
    require(k >= 2, "need k >= 2 sub-cells")
    val cellCent = readCentroids(spark, s"$dir/centroids")
    require(cellCent.exists(_._1 == cid), s"no cell $cid in $dir")
    val vecSource = if (meta.kind == "ivf_flat") "codes" else "vectors"
    val cellVecs = PartitionedStore
      .prunedRead(spark, s"$dir/$vecSource", "cell", Seq(cid))
      .select(col("id"), col("vec"))
      // materialize before appending to (and later deleting from) the
      // directory the plan reads
      .persist()
    try {
      val seedRows = cellVecs.orderBy("id").limit(k)
        .select(col("id"), asDouble(col("vec"))).collect()
      require(seedRows.length == k,
        s"cell $cid has only ${seedRows.length} vectors; need >= $k to split")
      val base = cellCent.map(_._1).max + 1
      val subCent = seedRows.zipWithIndex.map { case (r, i) =>
        (base + i, r.getSeq[Double](1).toArray) }.toSeq
      // orphan sub-cell dirs from a crashed prior attempt (it died
      // before the centroid swap, so base is recomputed the same and a
      // plain append would double every row) were already swept by the
      // entry recoverMaintenance: their cids are not in the centroids
      val reassigned = ivfAssign(cellVecs, "id", "vec", subCent)
        .select(col("neighbor_id").as("id"), col("__cv").as("vec"),
          col("__cid").as("cell"))
      if (meta.kind == "ivf_flat")
        reassigned
          .repartition(col("cell"))
          .write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
      else {
        val codeSeeds = readCentroids(spark, s"$dir/codebook")
          .map { case (c, v) => (c, v.toSeq) }
        ivfpqEncode(cellVecs, "id", "vec", subCent, codeSeeds,
            meta.m, meta.dim, meta.residual)
          .select(col("neighbor_id").as("id"), col("__b").as("b"),
            col("__cid").as("code"), col("__cell").as("cell"))
          .repartition(col("cell"))
          .write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
        reassigned
          .repartition(col("cell"))
          .write.mode("append").partitionBy("cell").parquet(s"$dir/vectors")
      }
      writeCentroids(spark, s"$dir/centroids",
        (cellCent.filterNot(_._1 == cid).map { case (c, v) => (c, v.toSeq) } ++
          subCent.map { case (c, v) => (c, v.toSeq) }).sortBy(_._1))
      writeMeta(spark, dir, meta.kind, meta.cells + k - 1, meta.m,
        meta.codebook, meta.dim, meta.residual, meta.keepVectors)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/codes/cell=$cid"), true)
      if (meta.kind == "ivf_pq")
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/vectors/cell=$cid"), true)
    } finally cellVecs.unpersist()
  }

  /** Compact every cell whose file count reached `minFiles` back to
    * one file per cell — the other maintenance valve next to
    * [[resplitCell]]: every [[addBatch]] / streaming-ingest
    * micro-batch appends at least one file to each touched cell, so
    * after thousands of batches a probe pays thousands of tiny-file
    * opens per probed cell (the classic small-files failure mode).
    * Only the flagged cells are read and rewritten (partition-pruned
    * scan per cell, write staged to `codes/.compact-<cell>` then
    * swapped in), centroids/codebook/meta untouched, results
    * bit-identical (SimilaritySpec pins probe equality). Works for
    * both layouts — compaction moves rows, never re-encodes.
    * Single-writer maintenance op, same contract as addBatch.
    * Returns the compacted cell ids. */
  def compactCells(spark: SparkSession, dir: String, minFiles: Int = 8): Seq[Long] = {
    recoverMaintenance(spark, dir, sweepRetired = true)
    // per-cell pruned reads, dot-prefixed staging, live→backup→live
    // rename swap — the shared single-partition-column machinery; the
    // raw-vector sidecar (when kept) accumulates ingest files at the
    // same rate as the codes and compacts alongside them
    val codes = PartitionedStore.compact(spark,
      new org.apache.hadoop.fs.Path(s"$dir/codes"), "cell", minFiles)
      .map(_.toLong)
    PartitionedStore.compact(spark,
      new org.apache.hadoop.fs.Path(s"$dir/vectors"), "cell", minFiles)
    codes
  }

  /** A full SAVE replaces any prior index, so tombstones (committed
    * or staged) against the old generation must not survive into the
    * new one — without this, a rebuilt index would silently mask ids
    * a prior generation happened to delete. */
  private def clearTombstones(spark: SparkSession, dir: String): Unit =
    PartitionedStore.clearTombstones(spark, dir)

  /** Tombstone-delete: mark `ids` deleted WITHOUT touching the
    * data-sized inverted file (the GDPR/right-to-erasure shape every
    * production vector store needs — FAISS `remove_ids`, the delta
    * tombstones of lakehouse tables). The id list is written as a
    * committed batch under `dir/tombstones/<tag>/`; every probe shape
    * ([[probe]], [[probeFiltered]], both layouts) anti-joins it
    * INSIDE the pruned cell scan before any distance work, so deleted
    * rows are invisible immediately at probe cost ∝ tombstones, and
    * [[vacuumDeletes]] later reclaims the bytes.
    *
    * Crash/replay discipline (the addBatchTagged contract, applied to
    * deletes): the batch stages under `dir/.staging-del-<tag>` and
    * COMMITS by one atomic directory rename — a crash before the
    * rename leaves only staging, which readers never list and which
    * the next write entry sweeps; re-running a committed tag is a
    * no-op, so any number of replays converges to exactly one copy.
    * Deleting an id that was never indexed is legal (the anti-join
    * ignores it); deleting an id twice across batches is legal (set
    * semantics). Single-writer, like every maintenance op.
    *
    * Stats note: [[indexStats]] reports PHYSICAL rows — tombstoned
    * ids stay in its counts until vacuum, exactly like the bytes they
    * still occupy. */
  def deleteIds(spark: SparkSession, dir: String, ids: DataFrame,
                idCol: String, tag: String): Unit = {
    recoverMaintenance(spark, dir, sweepRetired = true)
    PartitionedStore.commitTombstones(spark, dir,
      ids.select(col(idCol).cast("long").as("__tomb_id")), tag)
    PartitionedStore.refresh(spark, dir)
  }

  /** The committed tombstone set as one distinct-id relation, or None
    * when nothing is tombstoned. KB-to-MB scale in practice (deletes
    * are rare events over a corpus), but never collected — the probe
    * mask and vacuum both consume it as a relation. */
  private[graft] def readTombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    PartitionedStore.readTombstones(spark, dir)

  /** Physically remove tombstoned rows and retire the applied
    * tombstone batches — the reclaim half of [[deleteIds]]. Affected
    * cells are found by one column-pruned id scan of the inverted
    * file (vacuum is the deliberate heavy op; the probe-time mask is
    * the cheap path), and each is rewritten with the compactCells
    * swap discipline (stage `.compact-<cell>`, park live as
    * `.old-<cell>`, swap, drop backup) — so a crash at ANY point
    * leaves every cell individually live-or-backup, [[
    * recoverMaintenance]] heals it, and the tombstones (removed only
    * after every cell swapped) re-apply idempotently on the retry:
    * probes never see a deleted row, before, during, or after.
    * Rewrites the raw-vector sidecar alongside when kept. Returns the
    * rewritten cell ids.
    *
    * Reader-liveness bound: a lazy probe DataFrame planned BEFORE a
    * vacuum stays executable through the vacuum itself (retired
    * tombstone batches are parked, not deleted, and swapped cells read
    * through `.old-` backups) but NOT across the NEXT write op, which
    * sweeps the parked batch files — execute (collect/count/write) any
    * such probe before issuing another [[deleteIds]]/[[addBatchTagged]]/
    * [[compactCells]]/[[vacuumDeletes]]. Same contract as
    * [[BandIndex.vacuumDeletes]].
    *
    * Rewrite shape: ≤ 96 touched cells run as pooled per-cell jobs
    * (`parallelism` submitters); past that the shared plumbing
    * switches to ONE partitioned rewrite job over the affected cells
    * ([[PartitionedStore.rewriteExcludingAll]] — 5.2× at full touch,
    * SCALE.md r18). */
  def vacuumDeletes(spark: SparkSession, dir: String,
                    parallelism: Int = 16): Seq[Long] = {
    recoverMaintenance(spark, dir, sweepRetired = true)
    val toms = readTombstones(spark, dir).getOrElse(return Seq.empty)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // snapshot the batches being applied: a delete committed after
    // this listing survives this vacuum and applies at the next one
    val applied = PartitionedStore.tombstoneBatches(fs, dir)
    val tombIds = toms.persist()
    try {
      val affected = spark.read.parquet(s"$dir/codes")
        .select(col("id").cast("long").as("id"), col("cell").cast("long").as("cell"))
        .join(tombIds, col("id") === col("__tomb_id"), "left_semi")
        .select("cell").distinct().collect().map(_.getLong(0)).toIndexedSeq
      val keepVectors = readMeta(spark, dir).keepVectors
      val rewritten =
        (for (sub <- Seq("codes") ++ (if (keepVectors) Seq("vectors") else Nil))
          yield PartitionedStore.rewriteExcludingAll(spark,
            new org.apache.hadoop.fs.Path(s"$dir/$sub"), "cell",
            affected.map(_.toString), tombIds, "id", parallelism)).flatten.distinct
      // park, don't delete: a probe planned before this vacuum holds
      // file paths into the batch dirs (review r17); the next write
      // entry sweeps the parked files when no such plan can be live
      PartitionedStore.retireTombstones(fs, applied)
      PartitionedStore.refresh(spark, dir)
      rewritten.map(_.toLong).sorted
    } finally tombIds.unpersist()
  }

  /** Repair whatever a crashed maintenance pass left behind — called
    * from every WRITE entry point (compactCells, addBatch,
    * addBatchTagged, resplitCell) and from write entry points ONLY:
    * single-writer means nothing can be in flight when a writer runs,
    * so every remnant it sees really is a crash. A READER cannot make
    * that call — an in-flight compact mid-swap looks exactly like a
    * crashed one, and a reader "restoring" `.old-X` between the two
    * renames makes the writer's staged→live rename fail (ADVICE r14);
    * read entry points (probe, indexStats) therefore mutate NOTHING
    * and read through the remnants instead ([[PartitionedStore
    * .prunedRead]] serves an orphaned `.old-` backup's rows,
    * [[PartitionedStore.readPartitions]] lists them). The write-side
    * heal also matters for appends: an ingest that recreates a live
    * `cell=X` while `.old-X` still holds the pre-compaction rows would
    * make the next recovery delete `.old-X` — silently dropping every
    * old vector of that cell. Three repairs, in dependency order:
    *   1. `.old-<cid>` with no live `cell=<cid>` twin → the crash
    *      landed between [[compactCells]]' two renames; restore it.
    *      With a live twin the backup is stale → drop it.
    *   2. stale `.compact-*` staging dirs → leaked cell copy from a
    *      crash before the swap; drop.
    *   3. `cell=<cid>` dirs whose cid is absent from the centroids
    *      file → a [[resplitCell]] crash between the centroid swap and
    *      the old-dir delete leaves the retired cell on disk forever:
    *      probes never read it (cid is gone from the centroids), but
    *      indexStats would double-count the split vectors and
    *      compactCells keeps compacting a dead partition. Runs AFTER
    *      the `.old-` restore so a dead cell parked in backup is
    *      restored first and then swept by the same rule. Orphan
    *      sub-cell dirs from a resplit that crashed BEFORE its
    *      centroid swap are swept by the same rule (their cids are not
    *      in the centroids either), which is exactly the scrub the
    *      retry would do. (Readers ignore retired dirs without
    *      deleting: probe's scan is pruned to centroid-listed cells,
    *      indexStats filters its listing to live cids — so a reader
    *      concurrent with an in-flight resplit can never sweep the
    *      fresh sub-cells out from under the coming centroid swap.)
    * Listing-only plus one KB centroid read when there is nothing to
    * repair (the common case). */
  private def recoverMaintenance(spark: SparkSession, dir: String,
                                 sweepRetired: Boolean): Unit = {
    val codesRoot = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val fs = codesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    PartitionedStore.sweepRetiredTombstones(fs, dir)
    if (fs.exists(codesRoot)) {
      val vecsRoot = new org.apache.hadoop.fs.Path(s"$dir/vectors")
      PartitionedStore.recover(fs, codesRoot, "cell")
      PartitionedStore.recover(fs, vecsRoot, "cell")
      val centPath = new org.apache.hadoop.fs.Path(s"$dir/centroids")
      if (sweepRetired && fs.exists(centPath)) {
        val liveCids = readCentroids(spark, centPath.toString).map(_._1).toSet
        Seq(codesRoot, vecsRoot).foreach { root =>
          PartitionedStore.partitions(fs, root, "cell").foreach { pd =>
            val cid = pd.getName.stripPrefix("cell=").toLong
            if (!liveCids.contains(cid)) fs.delete(pd, true)
          }
        }
      }
    }
    // re-cache any cached plans over a store whose files a prior
    // save / compact / resplit swapped out (PartitionedStore.refresh
    // scaladoc). AFTER the FS repairs above: refresh re-executes
    // cached plans lazily against the tree as it stands, and recaching
    // against a still-parked `.old-` backup would capture an empty
    // listing for that partition (pinned by SimilaritySpec's
    // write-path recovery test).
    PartitionedStore.refresh(spark, dir)
  }

  /** Read-entry prologue (probe, indexStats): NO filesystem mutation —
    * see [[recoverMaintenance]]'s contract note. Only the driver-side
    * catalog refresh remains (re-lists cached plans over files a prior
    * maintenance op swapped; writes nothing). */
  private def readEntry(spark: SparkSession, dir: String): Unit =
    PartitionedStore.refresh(spark, dir)

  /** The distinct cells the query set will probe — a queries×nprobe
    * KB readback (same boundary class as the centroid pull) used to
    * prune the partitioned codes scan before the join. */
  private[graft] def probeCells(queries: DataFrame, idCol: String, vecCol: String,
                         cellCent: Seq[(Long, Array[Double])],
                         nprobe: Int): Seq[Any] =
    queries
      .select(explode(graft.expressions.VectorExpressions.nearest_centroids(
        asDouble(col(vecCol)), cellCent, nprobe,
        graft.expressions.VectorKernels.MetricCosine)).as("__pc"))
      .select(col("__pc").getField("cid")).distinct()
      .collect().map(_.getLong(0)).toSeq

  private[graft] case class Meta(kind: String, cells: Int, m: Int,
                                 codebook: Int, dim: Int, residual: Boolean,
                                 keepVectors: Boolean)

  private def writeMeta(spark: SparkSession, dir: String, kind: String,
                        cells: Int, m: Int, codebook: Int, dim: Int,
                        residual: Boolean, keepVectors: Boolean): Unit = {
    import spark.implicits._
    Seq(Meta(kind, cells, m, codebook, dim, residual, keepVectors)).toDF()
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession, dir: String): Meta =
    // fingerprint-memoized (optimization r18): every probe/ingest/
    // vacuum re-read this one-row parquet as a full Spark job
    PartitionedStore.memoizedReadback(spark, s"$dir/meta") {
      import spark.implicits._
      // an index saved before the keepVectors field existed has no such
      // column in its meta parquet; default it to false instead of
      // letting encoder resolution fail every entry point on old indexes
      val raw = spark.read.parquet(s"$dir/meta")
      val withDefault =
        if (raw.columns.contains("keepVectors")) raw
        else raw.withColumn("keepVectors", lit(false))
      withDefault.as[Meta].head()
    }

  private def writeCentroids(spark: SparkSession, path: String,
                             cent: Seq[(Long, Seq[Double])]): Unit = {
    import spark.implicits._
    cent.toDF("cid", "vec").coalesce(1).write.mode("overwrite").parquet(path)
  }

  private[graft] def readCentroids(spark: SparkSession, path: String): Seq[(Long, Array[Double])] =
    // fingerprint-memoized like readMeta: the centroid list is the KB
    // readback EVERY probe pays, and resplitCell's rewrite changes the
    // file fingerprint, so a memo hit is always the live centroid set
    PartitionedStore.memoizedReadback(spark, path) {
      spark.read.parquet(path).select("cid", "vec").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
    }

}
