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
    recoverBoth(spark, dir)
    val meta = readMeta(spark, dir)
    val sh = shingled(batch, idCol, textCol, meta)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      sh.withColumn("sbucket", sbucketOf(col("id"), meta))
        .repartition(col("sbucket"))
        .write.mode("append").partitionBy("sbucket").parquet(s"$dir/shingles")
      banded(sh, meta)
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
    recoverBoth(spark, dir)
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
      banded(sh, meta)
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
    val buckets = batchBands.select("bucket").distinct()
      .collect().map(_.getString(0)).toSeq
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
    recoverBoth(spark, dir)
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

  private def recoverBoth(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val bandRoot = new org.apache.hadoop.fs.Path(s"$dir/bands")
    val fs = bandRoot.getFileSystem(conf)
    PartitionedStore.recover(fs, bandRoot, "bucket")
    PartitionedStore.recover(fs,
      new org.apache.hadoop.fs.Path(s"$dir/shingles"), "sbucket")
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
