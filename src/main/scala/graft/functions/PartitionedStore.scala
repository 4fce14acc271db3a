package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** Shared crash-safe maintenance machinery for on-disk stores laid out
  * as a parquet tree partitioned by ONE column ([[AnnIndex]]'s
  * `codes/cell=…`, [[BandIndex]]'s `bands/bucket=…` and
  * `shingles/sbucket=…`): replay-idempotent tagged ingest (scrub the
  * tag's leftovers, stage the partitioned write, rename each staged
  * file to a deterministic `<tag>-<i>.parquet` name), the small-files
  * compaction valve (rewrite a partition to one file behind a
  * live→backup, staged→live rename swap), and the recovery pass that
  * repairs a crash at any point of either. Single-writer contract
  * throughout: one maintenance/ingest op per store at a time, readers
  * any time. [[recover]] runs on WRITE entry points only — a reader
  * cannot distinguish a crashed compact from one that is in flight
  * right now, and "repairing" the latter (restoring the live→backup
  * rename mid-swap) makes the writer's staged→live rename fail. Read
  * entry points never mutate: they read THROUGH crash remnants instead
  * ([[prunedRead]] serves a probed value from its orphaned `.old-`
  * backup, [[readPartitions]] lists backups as their value).
  *
  * The invariant the trio preserves: every committed row is reachable
  * under exactly one live `<part>=<v>` directory, no matter where a
  * previous op crashed — `.old-<v>` holds the rows while a compaction
  * swap is in flight and [[recover]] restores it if the swap never
  * finished; `.compact-*` / staging dirs are invisible to parquet
  * listings (dot-prefixed) and dropped on recovery.
  */
private[graft] object PartitionedStore {

  /** The live partition dirs of `root` (empty when the tree does not
    * exist yet — a store before its first write). */
  def partitions(fs: FileSystem, root: Path, partCol: String): Seq[Path] =
    if (fs.exists(root))
      fs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(partCol + "=")).map(_.getPath).toSeq
    else Seq.empty

  /** ONE root listing split into the reader's view: (live partition
    * dirs, orphan `.old-<v>` backups with no live twin, keyed by
    * value). The orphans are the rows of a [[compact]] that crashed
    * (or is in flight on another writer RIGHT NOW) between its
    * live→backup and staged→live renames — write entry points heal
    * them via [[recover]]; read entry points must not mutate, so they
    * read through the backup instead. Single listStatus call: at
    * 10⁴–10⁵ partition dirs the root listing is the dominant
    * metadata-plane cost of a probe (ProfileBandProbe ×100), so read
    * paths must never pay it twice for one view. */
  def readView(fs: FileSystem, root: Path, partCol: String)
  : (Seq[Path], Map[String, Path]) =
    if (!fs.exists(root)) (Seq.empty, Map.empty)
    else {
      val sts = fs.listStatus(root).filter(_.isDirectory)
      val live = sts.map(_.getPath)
        .filter(_.getName.startsWith(partCol + "=")).toSeq
      val liveVals = live.map(_.getName.stripPrefix(partCol + "=")).toSet
      val orphans = sts.filter(_.getPath.getName.startsWith(".old-"))
        .map(st => (st.getPath.getName.stripPrefix(".old-"), st.getPath))
        .filterNot { case (v, _) => liveVals(v) }
        .toMap
      (live, orphans)
    }

  /** The partition view a READER should use: (value, dir) for every
    * live partition, plus each orphan backup standing in for its
    * missing value — so stats/listing paths stay correct across a
    * crashed (or concurrently in-flight) compact without repairing
    * anything. One root listing. */
  def readPartitions(fs: FileSystem, root: Path, partCol: String): Seq[(String, Path)] = {
    val (live, orphans) = readView(fs, root, partCol)
    live.map(pd => (pd.getName.stripPrefix(partCol + "="), pd)) ++
      orphans.toSeq.sortBy(_._1)
  }

  /** Re-cache any CACHED plans referencing `dir` — called at every
    * store entry point. The rename swaps these stores do (compact /
    * overwrite / tagged replay) happen behind Spark's back, so a user
    * plan cached over the store before a swap holds a listing of the
    * swapped-out files; refreshByPath re-lists and recomputes it.
    * Fresh `spark.read` calls always re-list (each InMemoryFileIndex
    * gets its own file-status-cache client), so this guards only
    * still-cached plans. NOTE it is belt-and-braces, not sufficient on
    * its own: a cached plan that is plan-EQUAL to a new read
    * (InMemoryFileIndex equality is rootPaths-only) gets substituted
    * by the CacheManager at analysis time, which is why [[BandIndex
    * .probe]] severs its returned frame from the store's files with a
    * localCheckpoint instead of leaving a persisted plan behind. */
  def refresh(spark: SparkSession, dir: String): Unit =
    spark.catalog.refreshByPath(dir)

  /** Read ONLY the named partition values' directories of the tree —
    * discovery ∝ probed, not ∝ store. A plain
    * `spark.read.parquet(root).filter(part isin values)` prunes the
    * DATA pages correctly but pays partition DISCOVERY for the whole
    * tree: the file index lists every `<part>=<v>` directory, and past
    * `spark.sql.sources.parallelPartitionDiscovery.threshold` (32)
    * that listing becomes a Spark job per read — so probe PLANNING
    * grows with store size even while probed bytes stay flat (the
    * constant the ×100 ANN run surfaced: probe wall 1.95 s → 4.79 s at
    * a flat 0.1 MB scanned, SCALE.md). Listing the probed dirs under
    * `basePath` keeps discovery at one root listing plus a file index
    * over only the probed dirs. The
    * partition column survives via basePath discovery and the isin
    * filter is re-applied, so the executed plan keeps its `INSET`
    * PartitionFilters shape (PlanSpec pins it). Values absent from the
    * tree are skipped; a fully-absent value set falls back to the
    * full-tree read purely to preserve the result SCHEMA of an empty
    * probe. */
  def prunedRead(spark: SparkSession, rootDir: String, partCol: String,
                 values: Seq[Any]): DataFrame = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    prunedReadView(spark, rootDir, partCol, values, readView(fs, root, partCol))
  }

  /** [[prunedRead]] against an ALREADY-LISTED view — for callers that
    * just paid the root listing for their own bookkeeping (e.g. a
    * probe prefix-matching its buckets against the live dirs): at
    * 10⁴–10⁵ partitions each redundant listing is a measurable slice
    * of probe planning. */
  private[graft] def prunedReadView(spark: SparkSession, rootDir: String,
                                    partCol: String, values: Seq[Any],
                                    view: (Seq[Path], Map[String, Path])): DataFrame = {
    val (liveDirs, orphans) = view
    val live = liveDirs.map(_.getName).toSet
    val wanted = values.distinct
    val hit = wanted.map(v => s"$partCol=$v").filter(live)
    // read-through, never repair: a probed value whose live dir is
    // missing but whose `.old-<v>` backup survives is a compact that
    // crashed — or is in flight — between its two renames; serve its
    // rows from the backup dir with the partition column re-attached
    // (the dir's files were written under partitionBy, so they lack
    // it). Write entry points run recover() first and see no orphans.
    val orphanHit = wanted
      .filter(v => !live(s"$partCol=$v") && orphans.contains(v.toString))
    val base =
      if (hit.nonEmpty)
        Some(spark.read.option("basePath", rootDir)
          .parquet(hit.map(d => s"$rootDir/$d"): _*)
          .filter(col(partCol).isin(values: _*)))
      else if (orphanHit.isEmpty)
        // fully-absent value set: full-tree read purely to preserve
        // the result SCHEMA of an empty probe
        Some(spark.read.parquet(rootDir).filter(col(partCol).isin(values: _*)))
      else None
    val orphanReads = orphanHit.map { v =>
      val partType = base.map(_.schema(partCol).dataType).getOrElse(
        org.apache.spark.sql.catalyst.expressions.Literal(v).dataType)
      spark.read.parquet(orphans(v.toString).toString)
        .withColumn(partCol, lit(v).cast(partType))
    }
    (base.toSeq ++ orphanReads).reduce(_ unionByName _)
  }

  // ---- tombstone plumbing shared by the delete arms of both
  // persisted stores (AnnIndex / BandIndex). A committed delete batch
  // is a parquet dir of one `__tomb_id` column under
  // `<dir>/tombstones/<tag>/`; commit is ONE atomic directory rename
  // from `<dir>/.staging-del-<tag>` (a crash before it leaves only
  // staging, which readers never list and the next write entry
  // sweeps); replaying a committed tag is a no-op.

  /** Stage-and-commit a tombstone batch. `ids` must be a one-column
    * relation named `__tomb_id` (the caller fixes the type — it must
    * match the store's id column). Sweeps crashed delete stagings
    * first (single-writer: any leftover IS a crash remnant). */
  def commitTombstones(spark: SparkSession, dir: String, ids: org.apache.spark.sql.DataFrame,
                       tag: String): Unit = {
    require(tag.matches("[A-Za-z0-9_-]+"), s"tag must be a safe file prefix: $tag")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(s"$dir/tombstones")
    val fs = root.getFileSystem(conf)
    sweepDeleteStagings(fs, new Path(dir))
    val committed = new Path(root, tag)
    if (fs.exists(committed)) return // replayed tag: already committed
    val staging = new Path(s"$dir/.staging-del-$tag")
    ids.select(col("__tomb_id")).distinct()
      .write.mode("overwrite").parquet(staging.toString)
    fs.delete(new Path(staging, "_SUCCESS"), false)
    fs.mkdirs(root)
    require(fs.rename(staging, committed),
      s"tombstone commit rename failed for tag $tag")
  }

  /** The committed tombstone set as one distinct `__tomb_id` relation,
    * or None when nothing is tombstoned. Never collected — probe masks
    * and vacuums consume it as a relation. Dot-prefixed dirs (batches
    * a finished vacuum parked via [[retireTombstones]]) are not live. */
  def readTombstones(spark: SparkSession, dir: String): Option[org.apache.spark.sql.DataFrame] = {
    val root = new Path(s"$dir/tombstones")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val batches = fs.listStatus(root)
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
    if (batches.isEmpty) None
    else Some(spark.read.parquet(batches.toIndexedSeq: _*)
      .select(col("__tomb_id")).distinct())
  }

  /** The committed (live) tombstone batch dirs — for a vacuum to
    * snapshot at entry and retire after every affected partition
    * swapped. */
  def tombstoneBatches(fs: FileSystem, dir: String): Seq[Path] = {
    val root = new Path(s"$dir/tombstones")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .map(_.getPath).toIndexedSeq
  }

  /** Retire applied tombstone batches WITHOUT deleting their files: a
    * probe DataFrame planned before the vacuum holds concrete file
    * paths into the batch dirs, and a hard delete would fail it with
    * FileNotFound mid-execution (the store's readers are allowed to
    * run any time — the same reasoning as the `.old-` read-through).
    * Each dir is renamed to the dot-prefixed `.retired-<tag>` —
    * invisible to [[readTombstones]]/[[tombstoneBatches]] immediately
    * — and the FILES live until [[sweepRetiredTombstones]] runs from
    * the next WRITE entry point (single-writer: by then no plan that
    * could reference them is in flight). */
  def retireTombstones(fs: FileSystem, batches: Seq[Path]): Unit =
    batches.foreach { p =>
      val parked = new Path(p.getParent, s".retired-${p.getName}")
      fs.delete(parked, true) // a crashed prior retire of the same tag
      require(fs.rename(p, parked), s"tombstone retire rename $p failed")
    }

  /** Drop batches a prior vacuum parked — WRITE entry points only. */
  def sweepRetiredTombstones(fs: FileSystem, dir: String): Unit = {
    val root = new Path(s"$dir/tombstones")
    if (fs.exists(root))
      fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(".retired-"))
        .foreach(st => fs.delete(st.getPath, true))
  }

  /** A full SAVE replaces the store, so tombstones (committed or
    * staged) against the old generation must not survive into the new
    * one. */
  def clearTombstones(spark: SparkSession, dir: String): Unit = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dirPath)) {
      fs.delete(new Path(s"$dir/tombstones"), true)
      sweepDeleteStagings(fs, dirPath)
    }
  }

  private def sweepDeleteStagings(fs: FileSystem, dirPath: Path): Unit =
    if (fs.exists(dirPath))
      fs.listStatus(dirPath).filter(_.getPath.getName.startsWith(".staging-del-"))
        .foreach(st => fs.delete(st.getPath, true))

  /** Rewrite one live partition dir without the tombstoned ids, behind
    * the [[compact]] swap discipline (stage `.compact-<v>`, park live
    * as `.old-<v>`, swap, drop backup) — a crash at any point leaves
    * the partition individually live-or-backup for [[recover]], and
    * the not-yet-retired tombstones re-apply idempotently on retry.
    * Returns false (untouched) for a partition value with no live dir
    * — so callers report only REAL rewrites. */
  def rewriteExcluding(spark: SparkSession, root: Path, partCol: String,
                       value: String, tombIds: org.apache.spark.sql.DataFrame,
                       idCol: String): Boolean = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(root, s"$partCol=$value")
    if (!fs.exists(live)) return false
    val staged = new Path(root, s".compact-$value")
    val backup = new Path(root, s".old-$value")
    // Output file count is SIZE-based, not a blanket coalesce(1):
    // vacuum is not compaction — a genuinely large partition (GBs at
    // real store scale) rewritten through one task is a single-task
    // straggler that the submitter pool's across-partition parallelism
    // can't help (r17 session ADVICE). Target ~128 MB of INPUT bytes
    // per output file: small partitions still land as one file (the
    // fixture case, and the small-files valve's preference), large
    // ones keep task parallelism ∝ their size.
    val liveBytes = fs.listStatus(live)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val outFiles = math.max(1L, (liveBytes + (128L << 20) - 1) / (128L << 20)).toInt
    spark.read.parquet(live.toString)
      .join(tombIds, col(idCol) === col("__tomb_id"), "left_anti")
      .coalesce(outFiles)
      .write.mode("overwrite").parquet(staged.toString)
    fs.delete(new Path(staged, "_SUCCESS"), false)
    require(fs.rename(live, backup), s"vacuum: rename $live -> $backup failed")
    require(fs.rename(staged, live), s"vacuum: rename $staged -> $live failed")
    fs.delete(backup, true)
    true
  }

  /** Run `f` over `items` from a bounded submitter pool — the shared
    * concurrency plumbing of [[compact]] and [[rewriteExcludingAll]]
    * (each item is a tiny Spark job; sequential submission is pure
    * job-launch latency once tens of items are in play). Preserves
    * input order in the results. */
  private def pooled[T, R](items: Seq[T], parallelism: Int)(f: T => R): Seq[R] = {
    if (items.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, items.size)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(items.map(it =>
          scala.concurrent.Future(f(it)))),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }

  /** [[rewriteExcluding]] over many partition values from a bounded
    * submitter pool (the [[compact]] pattern — each rewrite is a tiny
    * Spark job and sequential submission is pure job-launch latency
    * once tens of partitions are affected; the per-partition swap is
    * unchanged, so a crash mid-pool leaves each partition individually
    * live-or-backup for [[recover]]).
    *
    * Past `bulkThreshold` affected partitions the per-partition shape
    * inverts: each rewrite is ~3 driver-dispatched Spark jobs (its
    * broadcast build, its write, its AQE stage) even when the
    * partition holds a few KB, so a vacuum touching MOST of the store
    * (a fractional delete re-banded across every bucket — the ×100
    * fraction arm measured 3 993 touched = 122 s of pure job dispatch,
    * SCALE.md r18) pays thousands of launches for one store's worth of
    * bytes. [[rewriteExcludingBulk]] reads all affected partitions in
    * ONE pruned scan, anti-joins the tombstones once, writes one
    * partitioned staging tree, then swaps each partition behind the
    * SAME live→backup→live rename discipline — crash-at-any-point
    * behavior is identical (each partition individually live-or-backup;
    * the `.compact-bulkvac` staging dir is swept by [[recover]]).
    *
    * Threshold MEASURED, not assumed (optimization r18,
    * tools/ProfileMaintSmall — the r18 build session measured 299/
    * 3 993 touched and extrapolated "pooled wins ≲ 100"): at 24
    * touched fixture partitions bulk is already 1.6× faster (1.76 vs
    * 2.81 s — the pooled path's ~0.11 s/partition dispatch beats the
    * bulk scan's ~0.7 s fixed cost from ~7 partitions up), at 2
    * touched pooled wins (0.42 vs 0.72 s). Default 8 = the measured
    * crossover; the bounded few-partition deletes stay pooled. */
  def rewriteExcludingAll(spark: SparkSession, root: Path, partCol: String,
                          values: Seq[String], tombIds: DataFrame,
                          idCol: String, parallelism: Int = 8,
                          bulkThreshold: Int = 8): Seq[String] =
    if (values.size >= bulkThreshold)
      rewriteExcludingBulk(spark, root, partCol, values, tombIds, idCol)
    else
      values.zip(pooled(values, parallelism)(v =>
          rewriteExcluding(spark, root, partCol, v, tombIds, idCol)))
        .collect { case (v, true) => v }

  /** The one-job twin of the pooled per-partition rewrite, for vacuums
    * that touch a large share of the store (see [[rewriteExcludingAll]]).
    * Returns the partition values actually rewritten (those with a
    * live dir). One documented difference from the per-partition path:
    * output file count per partition is sized from the AVERAGE
    * affected-partition bytes (~128 MB per file via a salt column in
    * the shuffle key) rather than per-partition exact — the bulk
    * regime is by construction many-partitions, where the average is
    * the right dial. Result-level parity is exact: a partition whose
    * every row is tombstoned (absent from the staged partitionBy
    * output) falls back to the per-partition rewrite, which keeps it
    * as an empty schema-bearing parquet dir — exactly the pooled
    * path's shape, so an all-deleted store stays READABLE (a
    * parquet-less tree would fail schema inference on the next
    * full-tree read). */
  def rewriteExcludingBulk(spark: SparkSession, root: Path, partCol: String,
                           values: Seq[String], tombIds: DataFrame,
                           idCol: String): Seq[String] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = partitions(fs, root, partCol)
      .map(_.getName.stripPrefix(partCol + "=")).toSet
    val affected = values.distinct.filter(live)
    if (affected.isEmpty) return Seq.empty
    val staging = new Path(root, ".compact-bulkvac")
    fs.delete(staging, true) // crash remnant of a prior attempt
    // one partition-pruned scan of every affected dir; per-output-file
    // sizing from the average affected bytes (the r17 ~128 MB/file
    // discipline, applied at the bulk grain). Listings run from the
    // submitter pool — thousands of SERIAL listStatus RPCs on exactly
    // the path whose point is removing per-partition overhead would
    // hand the win back to the metadata plane on an object store.
    val affectedBytes = pooled(affected, 16) { v =>
      fs.listStatus(new Path(root, s"$partCol=$v"))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    }.sum
    val splits = math.max(1L,
      (affectedBytes / affected.size + (128L << 20) - 1) / (128L << 20)).toInt
    val emptied = bulkStageAndSwap(spark, root, partCol, affected, staging,
      df => df.join(tombIds, col(idCol) === col("__tomb_id"), "left_anti")
        .withColumn("__vsplit", pmod(xxhash64(col(idCol)), lit(splits)))
        .repartition(col(partCol), col("__vsplit"))
        .drop("__vsplit"))
    // fully-tombstoned partitions (no staged output) go through the
    // per-partition rewrite, which writes the empty schema-bearing
    // file the pooled path would — exact result parity, and the count
    // is bounded by how many partitions were deleted WHOLE (≈0 in any
    // real vacuum)
    pooled(emptied, 8)(v =>
      rewriteExcluding(spark, root, partCol, v, tombIds, idCol))
    affected
  }

  /** Shared core of the bulk maintenance paths ([[rewriteExcludingBulk]]
    * and [[compact]]'s bulk arm): ONE pruned read of the affected
    * partitions, the caller's transform, one staged `partitionBy`
    * write, then the per-partition live→backup→live rename swap.
    * Returns the affected values with NO staged output (every row
    * transformed away) — the caller decides what an empty partition
    * becomes. A crash at any point leaves each partition individually
    * live-or-backup for [[recover]], which also sweeps the
    * `.compact-*` staging.
    *
    * Partition-column TYPE INFERENCE is off for the read: the staged
    * partitionBy re-RENDERS the inferred values as dir names, and
    * inference does not round-trip every name (a hex bucket "1e5"
    * infers as double 100000.0 → staged dir `bucket=100000.0` ≠ live
    * `bucket=1e5` → the swap would drop the partition as fully
    * deleted). With inference off the column is the dir-name STRING
    * and partitionBy writes it back byte-identically. Session conf,
    * saved/restored — safe under the store's single-writer contract
    * (no concurrent query planning in this session during
    * maintenance). */
  private def bulkStageAndSwap(spark: SparkSession, root: Path,
                               partCol: String, affected: Seq[String],
                               staging: Path,
                               transform: DataFrame => DataFrame): Seq[String] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val inferWas = spark.conf.get(inferKey)
    spark.conf.set(inferKey, "false")
    try
      transform(prunedRead(spark, root.toString, partCol, affected))
        .write.partitionBy(partCol).mode("overwrite").parquet(staging.toString)
    finally spark.conf.set(inferKey, inferWas)
    fs.delete(new Path(staging, "_SUCCESS"), false)
    val (have, emptied) = affected.partition(v =>
      fs.exists(new Path(staging, s"$partCol=$v")))
    have.foreach { v =>
      val liveDir = new Path(root, s"$partCol=$v")
      val backup = new Path(root, s".old-$v")
      require(fs.rename(liveDir, backup),
        s"bulk maintenance: rename $liveDir -> $backup failed")
      require(fs.rename(new Path(staging, s"$partCol=$v"), liveDir),
        s"bulk maintenance: rename -> $liveDir failed")
      fs.delete(backup, true)
    }
    fs.delete(staging, true)
    emptied
  }

  /** Delete every `<tag>-*` file from the live partition dirs — the
    * leftovers of a crashed prior attempt at the same tagged batch. */
  def scrubTag(fs: FileSystem, root: Path, partCol: String, tag: String): Unit =
    partitions(fs, root, partCol).foreach { pd =>
      fs.listStatus(pd)
        .filter(f => f.isFile && f.getPath.getName.startsWith(s"$tag-"))
        .foreach(f => fs.delete(f.getPath, false))
    }

  /** Move a staged partitioned write into the live tree under the
    * tag's deterministic file names (rename is atomic per file), then
    * drop the staging dir. Preceded by [[scrubTag]], any number of
    * replays of the same tagged batch converges to exactly one copy,
    * no matter where the previous attempt died. */
  def moveStagedTagged(fs: FileSystem, staging: Path, root: Path,
                       partCol: String, tag: String): Unit = {
    partitions(fs, staging, partCol).foreach { pd =>
      val dest = new Path(root, pd.getName)
      fs.mkdirs(dest)
      fs.listStatus(pd)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          val to = new Path(dest, s"$tag-$i.parquet")
          require(fs.rename(f.getPath, to),
            s"tagged ingest: rename ${f.getPath} -> $to failed")
        }
    }
    fs.delete(staging, true)
  }

  /** Compact every partition holding >= `minFiles` parquet files back
    * to one file — the valve against the classic small-files failure
    * mode (every ingest batch appends at least one file per touched
    * partition). Reads ONLY the flagged partitions (pruned per-dir
    * scans), swaps each behind live→backup, staged→live renames so a
    * crash at any point leaves the rows reachable, and returns the
    * compacted partition VALUES. Caller runs [[recover]] first. */
  def compact(spark: SparkSession, root: Path, partCol: String,
              minFiles: Int, parallelism: Int = 8,
              bulkThreshold: Int = 8): Seq[String] = {
    require(minFiles >= 2, "need minFiles >= 2")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val flagged = partitions(fs, root, partCol).filter { pd =>
      fs.listStatus(pd)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) >= minFiles
    }
    if (flagged.isEmpty) return Seq.empty
    // past bulkThreshold flagged partitions, per-partition compaction
    // jobs hit the same dispatch wall the vacuum's bulk arm removes
    // (SCALE.md r18 — heavy micro-batch ingest flags HUNDREDS): one
    // pruned read + one staged partitionBy write + the same swap.
    // repartition by the partition column alone lands each value in
    // one task → exactly one output file per partition, compaction's
    // contract. Compaction drops no rows, so no partition can come
    // back empty (the emptied return is a no-op by construction).
    if (flagged.size >= bulkThreshold) {
      val values = flagged.map(_.getName.stripPrefix(partCol + "="))
      val staging = new Path(root, ".compact-bulkvac")
      fs.delete(staging, true)
      bulkStageAndSwap(spark, root, partCol, values, staging,
        _.repartition(col(partCol)))
      return values
    }
    def compactOne(pd: Path): String = {
      val v = pd.getName.stripPrefix(partCol + "=")
      val backup = new Path(root, s".old-$v")
      val staged = new Path(root, s".compact-$v")
      spark.read.parquet(pd.toString).coalesce(1)
        .write.mode("overwrite").parquet(staged.toString)
      // drop the _SUCCESS marker so the swapped dir holds data files only
      fs.delete(new Path(staged, "_SUCCESS"), false)
      require(fs.rename(pd, backup), s"compact: rename $pd -> $backup failed")
      require(fs.rename(staged, pd), s"compact: rename $staged -> $pd failed")
      fs.delete(backup, true)
      v
    }
    // each partition's rewrite is a tiny Spark job; run them from a
    // bounded submitter pool — after heavy micro-batch ingest HUNDREDS
    // of partitions are flagged and sequential submission is pure
    // job-launch latency (the swap itself stays per-partition, so the
    // crash-safety story is unchanged; a crash mid-pool leaves each
    // partition individually live-or-backup and recover() heals)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, flagged.size)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futs = flagged.map(pd => scala.concurrent.Future(compactOne(pd)))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }

  /** Parquet footer row counts for an EXPLICIT file list, summed per
    * partition value — the stats-path scan that never touches Spark's
    * partition-discovery machinery: a full-tree `spark.read.parquet`
    * (or an explicit-paths read past
    * `spark.sql.sources.parallelPartitionDiscovery.threshold` = 32
    * paths) launches a listing job per call, so whole-store stats paid
    * a discovery job that grew with the store — the same planning
    * constant [[prunedRead]] removed from the probes. Here the caller
    * already holds the file list (the `partitions()` + per-dir listing
    * every stats method does anyway for file/byte counts), and the
    * counts come from one flat Spark job over those paths reading KB
    * footers — no listing, no data pages, cost ∝ files. Input is
    * (partitionValue, filePath); output sums per value. */
  def footerCounts(spark: SparkSession, files: Seq[(String, String)]): Map[String, Long] = {
    if (files.isEmpty) return Map.empty
    val confB = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(files, slices)
      .map { case (v, f) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(f), confB.value.value)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try (v, reader.getRecordCount) finally reader.close()
      }
      .reduceByKey(_ + _)
      .collect().toMap
  }

  /** Java-serializable Hadoop `Configuration` carrier (the filesystem
    * credentials/settings the executor-side footer reads need) —
    * `Configuration` is `Writable` but not `Serializable`, so ship it
    * through its own Writable encoding. */
  private class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit =
      value.write(out)
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  // ---- KB-readback memo (optimization r18). Every store entry point
  // re-reads its KB-sized driver metadata (BandIndex meta row, AnnIndex
  // meta row + centroid list) as a fresh parquet read — one Spark job
  // plus its planning gap per call, ~0.1–0.3 s of pure dispatch in a
  // lifecycle bundle that probes three times (d21's probe phase runs
  // 54 jobs; 6+ of them are these rereads). The memo keys on the
  // path's FILE FINGERPRINT (name + length + mtime of every file, one
  // listStatus RPC): a re-save rewrites the files under fresh
  // part-<uuid> names, so staleness is structurally impossible —
  // unlike a mutation counter, this also survives another process
  // rewriting the store. Cleared by [[clearReadbackMemo]] (wired into
  // SparkEntry.releaseCaches) so Bench's every-pass-pays-its-own-
  // materialization discipline holds: the memo shares within a pass
  // exactly like the query packs' own memoized intermediates.

  // Count-bounded LRU (ADVICE r18): values are KB-scale for the meta
  // rows but an ANN centroid list is cells × dim doubles — a long-lived
  // session touching many indexes must not accumulate driver memory
  // without bound. 64 live stores is far above any bench/pipeline
  // shape; past it the least-recently-USED path re-reads (correctness
  // unaffected — the memo is a pure dispatch-cost cache).
  private val readbackMemoCap = 64
  private val readbackMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (String, AnyRef)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, AnyRef)]): Boolean =
        size() > readbackMemoCap
    })

  /** `read`'s result memoized under `path`, revalidated against the
    * path's file fingerprint on every call. Falls through to `read`
    * (typically failing with the reader's own error) when the path
    * cannot be listed. Values must be KB-scale driver objects. */
  def memoizedReadback[T <: AnyRef](spark: SparkSession, path: String)
                                   (read: => T): T = {
    val p = new Path(path)
    val fp =
      try {
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(_.isFile)
          .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
          .sorted.mkString("|")
      } catch { case _: java.io.IOException => return read }
    val cached = readbackMemo.get(path)
    if (cached != null && cached._1 == fp) cached._2.asInstanceOf[T]
    else {
      val v = read
      readbackMemo.put(path, (fp, v))
      v
    }
  }

  def clearReadbackMemo(): Unit = readbackMemo.clear()

  /** Repair a crashed [[compact]]: a `.old-<v>` with no live
    * `<part>=<v>` twin means the crash landed between the two renames
    * — restore it; with a live twin the backup is stale — drop it.
    * Also drops leaked `.compact-*` staging dirs. Listing-only when
    * there is nothing to repair (the common case). WRITE entry points
    * ONLY (single-writer means nothing can be in flight when they
    * run): called from a read path this races a live [[compact]] — a
    * reader restoring the backup between the two renames makes the
    * writer's staged→live rename fail, and deleting `.compact-*`
    * deletes the write in progress. Readers use [[prunedRead]] /
    * [[readPartitions]], which read through the remnants unmutated. */
  def recover(fs: FileSystem, root: Path, partCol: String): Unit =
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val nm = st.getPath.getName
        if (st.isDirectory && nm.startsWith(".old-")) {
          val live = new Path(root, s"$partCol=${nm.stripPrefix(".old-")}")
          if (!fs.exists(live)) require(fs.rename(st.getPath, live),
            s"crash recovery rename ${st.getPath} -> $live failed")
          else fs.delete(st.getPath, true)
        } else if (st.isDirectory && nm.startsWith(".compact-"))
          fs.delete(st.getPath, true)
      }
}
