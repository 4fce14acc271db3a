package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Persisted MinHash-LSH band index: the dedup analogue of
  * [[AnnIndex]] — nightly near-dup ingestion against a 100-TB corpus
  * cannot re-shingle and re-band the whole history per batch, which is
  * exactly what the in-session incremental path admits it would do
  * ([[DedupFunctions.incrementalNearDuplicates]] builds the "stored"
  * band index in-call). This stores it for real, with the same
  * operability valves the ANN index grew in round 12. The reference
  * has no dedup surface at any size (`fireworks/toolbox/pipes.py`
  * stops at row-level map/filter); this extends its incremental-stream
  * semantics (`pipes.py:62-63` reset/replay) to the LSH family.
  *
  * Layout under `dir` (all parquet):
  *   meta/      one row: shingleN, numHashes, bands, hashFamily,
  *              prefixLen, idBuckets
  *   bands/     the DATA-sized LSH postings, (id, band) partitioned by
  *              `bucket` = the band key's first `prefixLen` hex chars:
  *              a probe reads only its batch's buckets (statically
  *              pruned, the same PartitionFilters story PlanSpec pins
  *              for the ANN codes scan)
  *   shingles/  (id, sh) — the exact-verify sets, partitioned by
  *              `sbucket` = pmod(xxhash64(id), idBuckets) so the
  *              verify stage reads only the candidate ids' buckets
  *
  * Probe semantics are the contract [[DedupFunctions
  * .incrementalNearDuplicates]] defines: verified pairs (a, b, jac)
  * touching at least one batch doc, identical to running
  * [[DedupFunctions.minhashNearDuplicates]] over indexed ∪ batch and
  * keeping pairs with a batch side (the d16 oracle gates exactly
  * that). Ids must be globally unique across the index and every
  * batch, and keep ONE type across save/ingest/probe (sbucket hashes
  * the id value as its column type).
  *
  * Scale shape: ingest cost is ∝ batch (encode + append; existing
  * partitions untouched), probe cost is ∝ batch × bands joining
  * bucket-pruned postings plus a candidates-only verify — never
  * corpus², never a re-band of history. Maintenance mirrors AnnIndex
  * via the shared [[PartitionedStore]] machinery: replay-idempotent
  * tagged ingest for sources that retry (streaming foreachBatch),
  * [[compact]] as the small-files valve, and a recovery pass on every
  * entry point so a crash anywhere leaves every committed row
  * reachable exactly once. Single-writer contract for writes.
  */
object BandIndex {

  import DedupFunctions.{wordShingles, bandKeys, jaccard}

  private[graft] case class Meta(shingleN: Int, numHashes: Int, bands: Int,
                                 hashFamily: String, prefixLen: Int,
                                 idBuckets: Int)

  /** Build the index from `docs` and save it under `dir`, replacing
    * any prior index. Banding parameters match
    * [[DedupFunctions.minhashNearDuplicates]]; `prefixLen` hex chars
    * of the band key form the postings partition (16^prefixLen
    * buckets), `idBuckets` partitions the shingle store by id hash. */
  def save(docs: DataFrame, idCol: String, textCol: String,
           shingleN: Int, numHashes: Int, bands: Int, dir: String,
           hashFamily: String = "md5", prefixLen: Int = 2,
           idBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    val meta = checkedMeta(shingleN, numHashes, bands, hashFamily,
      prefixLen, idBuckets)
    writeMeta(spark, dir, meta)
    val sh = shingled(docs, idCol, textCol, meta)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      sh.withColumn("sbucket", sbucketOf(col("id"), meta))
        .repartition(col("sbucket"))
        .write.mode("overwrite").partitionBy("sbucket")
        .parquet(s"$dir/shingles")
      banded(sh, meta)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$dir/bands")
    } finally sh.unpersist(blocking = false)
  }

  /** Append a delta batch (encoded against the SAVED banding
    * parameters — no re-read of existing postings) to both stores.
    * For a source that RETRIES batches use [[addBatchTagged]]: a crash
    * between the two appends here leaves the batch's bands without its
    * shingles (or vice versa) until re-ingested, which the tagged
    * replay heals and a plain append cannot. */
  def addBatch(spark: SparkSession, dir: String, batch: DataFrame,
               idCol: String, textCol: String): Unit = {
    recoverBoth(spark, dir, healInflight = true)
    val meta = readMeta(spark, dir)
    val sh = shingled(batch, idCol, textCol, meta)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      sh.withColumn("sbucket", sbucketOf(col("id"), meta))
        .repartition(col("sbucket"))
        .write.mode("append").partitionBy("sbucket").parquet(s"$dir/shingles")
      bandedRouted(spark, dir, sh, meta)
        .repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(s"$dir/bands")
    } finally sh.unpersist(blocking = false)
  }

  /** Replay-idempotent [[addBatch]]: both stores' files are staged,
    * then renamed into the live tree under `<tag>-<i>.parquet` names;
    * a re-run with the same tag first scrubs the tag's leftovers from
    * BOTH stores, so any number of replays — including one that
    * crashed between the shingle and band appends — converges to
    * exactly one copy of the batch. */
  def addBatchTagged(spark: SparkSession, dir: String, batch: DataFrame,
                     idCol: String, textCol: String, tag: String): Unit = {
    require(tag.matches("[A-Za-z0-9_-]+"), s"tag must be a safe file prefix: $tag")
    require(!tag.startsWith("rebucket-"),
      "the rebucket- tag prefix is reserved for [[rebucket]]'s staged moves")
    recoverBoth(spark, dir, healInflight = true)
    val meta = readMeta(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val shRoot = new org.apache.hadoop.fs.Path(s"$dir/shingles")
    val bandRoot = new org.apache.hadoop.fs.Path(s"$dir/bands")
    val fs = bandRoot.getFileSystem(conf)
    PartitionedStore.scrubTag(fs, shRoot, "sbucket", tag)
    PartitionedStore.scrubTag(fs, bandRoot, "bucket", tag)
    val sh = shingled(batch, idCol, textCol, meta)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val shStaging = new org.apache.hadoop.fs.Path(s"$dir/.staging-sh-$tag")
      sh.withColumn("sbucket", sbucketOf(col("id"), meta))
        .repartition(col("sbucket"))
        .write.mode("overwrite").partitionBy("sbucket")
        .parquet(shStaging.toString)
      PartitionedStore.moveStagedTagged(fs, shStaging, shRoot, "sbucket", tag)
      val bandStaging = new org.apache.hadoop.fs.Path(s"$dir/.staging-bands-$tag")
      bandedRouted(spark, dir, sh, meta)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(bandStaging.toString)
      PartitionedStore.moveStagedTagged(fs, bandStaging, bandRoot, "bucket", tag)
    } finally sh.unpersist(blocking = false)
  }

  /** Verified near-dup pairs (a, b, jac) between `batch` and the
    * indexed corpus ∪ batch — exactly [[DedupFunctions
    * .incrementalNearDuplicates]]'s result, with the corpus side
    * served from disk: the batch's band keys select the postings
    * buckets (static partition pruning), the candidate ids' hash
    * buckets select the shingle partitions for the exact verify.
    * The two driver readbacks are bucket-ID lists (≤ 16^prefixLen and
    * ≤ idBuckets values — the probeCells boundary class), never data. */
  def probe(spark: SparkSession, dir: String, batch: DataFrame,
            idCol: String, textCol: String, threshold: Double): DataFrame = {
    recoverBoth(spark, dir)
    val meta = readMeta(spark, dir)
    val batchSh = shingled(batch, idCol, textCol, meta)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val batchBands = banded(batchSh, meta)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // base (prefixLen) buckets of the batch, widened to the live dirs
    // they prefix-match: a [[rebucket]]-split hot bucket stores its
    // postings under LONGER bucket values, and the exact prunedRead
    // over the matched names keeps the INSET PartitionFilters shape
    val baseBuckets = batchBands.select("bucket").distinct()
      .collect().map(_.getString(0)).toSeq
    val buckets = prefixMatched(spark, s"$dir/bands", baseBuckets)
    val idxBands = PartitionedStore
      .prunedRead(spark, s"$dir/bands", "bucket", buckets)
      .select("id", "band")
    // probe batch × (index ∪ batch): batch-old pairs land once,
    // batch-batch twice (both sides probe) — canonicalize and distinct
    val cand = batchBands.as("x")
      .join(idxBands.unionByName(batchBands.select("id", "band")).as("y"),
        col("x.band") === col("y.band") && col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sbuckets = cand
      .select(explode(array(col("a"), col("b"))).as("id"))
      .select(sbucketOf(col("id"), meta).as("sb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val idxSh = PartitionedStore
      .prunedRead(spark, s"$dir/shingles", "sbucket", sbuckets)
      .select("id", "sh")
    val sh = idxSh.unionByName(batchSh)
    val verified = cand
      .join(sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "__sha"), Seq("a"))
      .join(sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "__shb"), Seq("b"))
      .withColumn("jac", jaccard(col("__sha"), col("__shb")))
      .filter(col("jac") >= threshold)
      .select("a", "b", "jac")
    // Materialize AND sever the result from the store's files via an
    // eager localCheckpoint: the returned plan is a LogicalRDD (fresh
    // RDD id), never plan-equal to a later probe's. Returning a
    // persist()ed frame instead leaves a CacheManager entry whose plan
    // IS equal to the next probe over the same buckets
    // (InMemoryFileIndex equality is rootPaths-only), so after a
    // compact/save swaps files in between, the next probe gets
    // substituted with the stale entry and dies FILE_NOT_EXIST on the
    // swapped-out files — the d16 bench flake, reproduced
    // deterministically in BandIndexSpec's crash test. Pair-sized
    // blocks, GC-released; no caller-side unpersist contract.
    val out = verified.localCheckpoint(true)
    Seq(cand, batchBands, batchSh).foreach(_.unpersist(blocking = false))
    out
  }

  /** Compact every partition of both stores that reached `minFiles`
    * files back to one file — the small-files valve for micro-batch
    * ingest, crash-safe behind [[PartitionedStore]]'s rename swap.
    * Returns (store, partitionValue) per compacted partition. */
  def compact(spark: SparkSession, dir: String,
              minFiles: Int = 8): Seq[(String, String)] = {
    recoverBoth(spark, dir, healInflight = true)
    PartitionedStore.compact(spark,
        new org.apache.hadoop.fs.Path(s"$dir/bands"), "bucket", minFiles)
      .map("bands" -> _) ++
      PartitionedStore.compact(spark,
        new org.apache.hadoop.fs.Path(s"$dir/shingles"), "sbucket", minFiles)
        .map("shingles" -> _)
  }

  /** Per-bucket footprint of the postings store without scanning data
    * pages (footer row counts + filesystem listing, the indexStats
    * pattern): the skew report that shows which band buckets ingest
    * has grown hot and how many files [[compact]] would fold. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    recoverBoth(spark, dir)
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(s"$dir/bands")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fsRows = PartitionedStore.partitions(fs, root, "bucket").map { pd =>
      val files = fs.listStatus(pd)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      (pd.getName.stripPrefix("bucket="), files.map(_.getPath.toString),
        files.length.toLong, files.map(_.getLen).sum)
    }
    // posting counts from parquet FOOTERS over the listed files — one
    // flat Spark job, no whole-store partition-discovery job no matter
    // how many buckets ingest has grown (PartitionedStore.footerCounts)
    val counts = PartitionedStore.footerCounts(spark,
      fsRows.flatMap { case (b, files, _, _) => files.map((b, _)) })
    fsRows
      .map { case (b, _, nFiles, bytes) =>
        (b, counts.getOrElse(b, 0L), nFiles, bytes)
      }
      .toDF("bucket", "n_postings", "n_files", "bytes")
      .orderBy("bucket")
  }

  /** Split ONE hot postings bucket by the next `extraLen` hex chars of
    * its band keys — the hot-bucket valve `prefixLen`-at-save-time
    * otherwise lacks: near-identical boilerplate docs all landing one
    * band value grow a single bucket without bound, and the only other
    * remedy is a full re-save of the postings store. Only the split
    * bucket's partition is read and rewritten (cost ∝ bucket, never ∝
    * store); shingles are untouched. Probes need no migration flag:
    * they widen each batch bucket to the live dirs it prefixes
    * ([[prefixMatched]]), and ingest routes new postings to the
    * deepest live dir ([[bandedRouted]]), so mixed depths — including
    * a re-split of a split ([[rebucket]] composes) — coexist.
    *
    * Crash protocol (single-writer, shared-machinery shapes): a marker
    * `.rebucket-inflight-<bucket>-<gen>` brackets the op (gen = a
    * per-op stamp, so a later split of a RECREATED base dir never
    * collides with — or scrubs — a completed earlier split's files);
    * the re-bucketed rows are staged and renamed in under the RESERVED
    * tag `rebucket-<bucket>-<gen>`; the old dir retires via an atomic
    * rename to `.retired-<bucket>` before deletion. The next WRITE
    * entry point's [[recoverBoth]] heals any crash point: old dir
    * still live → the split never committed, scrub the tag's files
    * (exactly what a retry would do); old dir renamed away →
    * committed, finish the delete. Healing is write-entry-only for the
    * same reason as [[AnnIndex]]'s retired-cell sweep — to a
    * concurrent READER an in-flight split is indistinguishable from a
    * crashed one, and scrubbing it would delete data the commit rename
    * is about to make canonical. Readers need no healing to stay
    * correct: an uncommitted split's postings exist twice (base dir +
    * tagged split files) and probe candidates are `.distinct()`ed, so
    * duplicate postings never change the verified pairs (BandIndexSpec
    * pins both arms and the mid-flight read). */
  def rebucket(spark: SparkSession, dir: String, bucket: String,
               extraLen: Int = 1): Unit = {
    recoverBoth(spark, dir, healInflight = true)
    require(extraLen >= 1 && bucket.length + extraLen <= 8,
      s"need 1 <= extraLen and bucket+extra <= 8 hex chars, got " +
        s"'$bucket' + $extraLen")
    require(bucket.matches("[0-9a-f]+"), s"bucket must be hex chars: $bucket")
    val bandRoot = new org.apache.hadoop.fs.Path(s"$dir/bands")
    val fs = bandRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveDir = new org.apache.hadoop.fs.Path(bandRoot, s"bucket=$bucket")
    require(fs.exists(liveDir), s"no live postings bucket '$bucket' in $dir")
    val gen = System.currentTimeMillis
    val tag = s"rebucket-$bucket-$gen"
    val marker = new org.apache.hadoop.fs.Path(bandRoot, s".rebucket-inflight-$bucket-$gen")
    fs.create(marker, true).close()
    val staging = new org.apache.hadoop.fs.Path(s"$dir/.staging-$tag")
    PartitionedStore.prunedRead(spark, bandRoot.toString, "bucket", Seq(bucket))
      .select(col("id"), col("band"),
        substring(col("band"), 1, bucket.length + extraLen).as("bucket"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    PartitionedStore.moveStagedTagged(fs, staging, bandRoot, "bucket", tag)
    // commit point: the old dir leaves the live tree atomically
    val retired = new org.apache.hadoop.fs.Path(bandRoot, s".retired-$bucket")
    require(fs.rename(liveDir, retired), s"rebucket: retiring $liveDir failed")
    fs.delete(retired, true)
    fs.delete(marker, false)
    PartitionedStore.refresh(spark, dir)
  }

  /** The live postings dirs a probe's base buckets select: each stored
    * value keeps its full band-key prefix, so a value belongs to base
    * bucket b iff it starts with b. Driver-side listing (the same one
    * recovery already pays), ≤ 16^prefixLen + splits names. */
  private def prefixMatched(spark: SparkSession, rootDir: String,
                            baseBuckets: Seq[String]): Seq[Any] = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = baseBuckets.toSet
    PartitionedStore.partitions(fs, root, "bucket")
      .map(_.getName.stripPrefix("bucket="))
      .filter(v => base.exists(v.startsWith))
  }

  /** [[banded]] with the bucket column routed to the DEEPEST live dir
    * whose value prefixes the band key — so ingest after a
    * [[rebucket]] keeps feeding the split dirs instead of recreating
    * the retired base dir. Band keys whose split-depth dir does not
    * exist yet fall back to the base (prefixLen) bucket, which probes
    * still find by prefix match. The when-chain is over the handful of
    * deeper-than-base live values (the valve is for hot buckets, not
    * the whole keyspace); entry points run recovery first, so the live
    * tree the routing reads is already healed. */
  private def bandedRouted(spark: SparkSession, dir: String, sh: DataFrame,
                           meta: Meta): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/bands")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deeper = PartitionedStore.partitions(fs, root, "bucket")
      .map(_.getName.stripPrefix("bucket="))
      .filter(_.length > meta.prefixLen)
      .sortBy(-_.length)
    val basic = banded(sh, meta)
    if (deeper.isEmpty) basic
    else {
      val routed = deeper.foldLeft(
        when(lit(false), lit(null: String))) { (acc, v) =>
          acc.when(substring(col("band"), 1, v.length) === v, lit(v))
        }.otherwise(col("bucket"))
      basic.withColumn("bucket", routed)
    }
  }

  // ---- shared encode / layout helpers ----

  private def checkedMeta(shingleN: Int, numHashes: Int, bands: Int,
                          hashFamily: String, prefixLen: Int,
                          idBuckets: Int): Meta = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands must divide numHashes (got numHashes=$numHashes, bands=$bands)")
    require(prefixLen >= 1 && prefixLen <= 8,
      s"prefixLen must be in [1, 8], got $prefixLen")
    require(idBuckets >= 1, s"idBuckets must be >= 1, got $idBuckets")
    Meta(shingleN, numHashes, bands, hashFamily, prefixLen, idBuckets)
  }

  /** (id, sh) with the no-shingle docs (< shingleN words → NULL set)
    * dropped: they can never band, so neither store carries them —
    * matching the in-session pipelines, where such docs form no
    * candidates. */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
                       meta: Meta): DataFrame =
    docs.select(col(idCol).as("id"),
        wordShingles(col(textCol), meta.shingleN).as("sh"))
      .filter(col("sh").isNotNull)

  /** (id, band, bucket) — one posting per (doc, band key), bucketed by
    * the key's hex prefix for the probe's static partition pruning. */
  private def banded(sh: DataFrame, meta: Meta): DataFrame =
    sh.withColumn("band", explode(bandKeys(
        graft.expressions.HashExpressions.minhash_signature(
          col("sh"), meta.numHashes, meta.hashFamily),
        meta.bands, meta.numHashes / meta.bands)))
      .select(col("id"), col("band"),
        substring(col("band"), 1, meta.prefixLen).as("bucket"))

  private def sbucketOf(id: org.apache.spark.sql.Column, meta: Meta) =
    pmod(xxhash64(id), lit(meta.idBuckets.toLong))

  /** Crash repair for both stores. `healInflight` (write entry points
    * only — single-writer means no op can actually be in flight then)
    * additionally settles any crashed [[rebucket]] from its marker:
    * base dir still live → uncommitted, scrub the op's tagged files;
    * base dir gone → committed, drop the `.retired-` remnant; either
    * way drop the marker and any leaked `.staging-rebucket-*` dirs.
    * Read entry points skip this arm — to a reader an IN-FLIGHT
    * rebucket looks exactly like a crashed one, and scrubbing it would
    * delete the files its commit rename is about to make canonical;
    * readers are correct unhealed because probe dedups candidates
    * (stats may transiently double-count a crashed split's postings
    * until the next write op heals — report-grade, documented). */
  private def recoverBoth(spark: SparkSession, dir: String,
                          healInflight: Boolean = false): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val bandRoot = new org.apache.hadoop.fs.Path(s"$dir/bands")
    val fs = bandRoot.getFileSystem(conf)
    PartitionedStore.recover(fs, bandRoot, "bucket")
    PartitionedStore.recover(fs,
      new org.apache.hadoop.fs.Path(s"$dir/shingles"), "sbucket")
    if (healInflight && fs.exists(bandRoot)) {
      fs.listStatus(bandRoot)
        .filter(_.getPath.getName.startsWith(".rebucket-inflight-"))
        .foreach { m =>
          val suffix = m.getPath.getName.stripPrefix(".rebucket-inflight-")
          // suffix = <hexbucket>-<gen>; the bucket has no dashes
          val bucket = suffix.substring(0, suffix.lastIndexOf('-'))
          val live = new org.apache.hadoop.fs.Path(bandRoot, s"bucket=$bucket")
          val retired = new org.apache.hadoop.fs.Path(bandRoot, s".retired-$bucket")
          if (fs.exists(live))
            PartitionedStore.scrubTag(fs, bandRoot, "bucket", s"rebucket-$suffix")
          else if (fs.exists(retired)) fs.delete(retired, true)
          fs.delete(m.getPath, false)
        }
      val dirRoot = new org.apache.hadoop.fs.Path(dir)
      if (fs.exists(dirRoot))
        fs.listStatus(dirRoot)
          .filter(_.getPath.getName.startsWith(".staging-rebucket-"))
          .foreach(st => fs.delete(st.getPath, true))
    }
    // re-cache any cached plans over a store whose files a prior
    // save / compact / tagged replay swapped out (PartitionedStore
    // .refresh scaladoc; probe's localCheckpoint is what actually
    // fixed the d16 bench flake). AFTER the FS repairs above: refresh
    // re-executes cached plans lazily against the tree as it stands,
    // and recaching against a still-parked `.old-` backup would
    // capture an empty listing for that partition.
    PartitionedStore.refresh(spark, dir)
  }

  private def writeMeta(spark: SparkSession, dir: String, meta: Meta): Unit = {
    import spark.implicits._
    Seq(meta).toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private[graft] def readMeta(spark: SparkSession, dir: String): Meta = {
    import spark.implicits._
    spark.read.parquet(s"$dir/meta").as[Meta].head()
  }
}
