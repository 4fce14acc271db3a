package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BandIndex, DedupFunctions}

/** The persisted band index against its in-session oracle
  * (incrementalNearDuplicates) plus the crash/maintenance pins the
  * AnnIndex family established — the disk layout must never change
  * WHAT pairs come back, only where the corpus side is served from. */
class BandIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("probe equals the in-session incremental path exactly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_band_probe").toString
    BandIndex.save(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, dir = dir)
    val batch = docs.filter(col("doc_id") < 25)
      .select((col("doc_id") + 70000L).as("doc_id"), col("text"))
    val persisted = pairSet(BandIndex.probe(spark, dir, batch,
      "doc_id", "text", threshold = 0.8))
    val inSession = pairSet(DedupFunctions.incrementalNearDuplicates(
      docs, batch, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8))
    assert(persisted == inSession,
      "disk-served probe must return the exact in-session pair set")
    assert(persisted.nonEmpty, "planted copies must surface as pairs")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("tagged replay converges; compaction folds files and changes nothing; crash mid-swap heals on every entry") {
    import org.apache.hadoop.fs.Path
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .filter(col("doc_id") < 120)
    val dir = java.nio.file.Files.createTempDirectory("graft_band_crash").toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    BandIndex.save(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, dir = dir)
    def postings() = spark.read.parquet(s"$dir/bands").count()
    def shRows() = spark.read.parquet(s"$dir/shingles").count()
    val base = (postings(), shRows())

    // tagged replay: same tag twice -> exactly one copy in BOTH stores
    val b1 = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 50000L).as("doc_id"), col("text"))
    BandIndex.addBatchTagged(spark, dir, b1, "doc_id", "text", tag = "t1")
    val once = (postings(), shRows())
    BandIndex.addBatchTagged(spark, dir, b1, "doc_id", "text", tag = "t1")
    assert((postings(), shRows()) == once,
      "tagged replay must converge to exactly one copy in both stores")
    assert(once._1 > base._1 && once._2 > base._2)

    val probeB = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 60000L).as("doc_id"), col("text"))
    def probed() = BandIndex.probe(spark, dir, probeB, "doc_id", "text", 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pBefore = probed()
    assert(pBefore.nonEmpty)

    // compaction: flagged partitions fold to one file, rows conserved,
    // probe identical
    val compacted = BandIndex.compact(spark, dir, minFiles = 2)
    assert(compacted.nonEmpty, "ingest must have produced multi-file partitions")
    compacted.foreach { case (store, v) =>
      val partCol = if (store == "bands") "bucket" else "sbucket"
      val n = fs.listStatus(new Path(s"$dir/$store/$partCol=$v"))
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      assert(n == 1, s"$store/$partCol=$v not single-file after compact")
    }
    assert((postings(), shRows()) == once, "compaction must conserve rows")
    assert(probed() == pBefore, "compaction changed probe results")

    // crash mid-swap: live bucket parked in backup + a stale staging
    // leak -> the next entry point (stats here) restores both stores'
    // invariant before reading
    val victim = fs.listStatus(new Path(s"$dir/bands"))
      .filter(_.getPath.getName.startsWith("bucket=")).head.getPath
    val v = victim.getName.stripPrefix("bucket=")
    fs.rename(victim, new Path(s"$dir/bands/.old-$v"))
    fs.mkdirs(new Path(s"$dir/bands/.compact-$v"))
    assert(BandIndex.stats(spark, dir).agg(sum("n_postings")).head.getLong(0)
      == once._1, "stats must restore the mid-swap bucket")
    assert(!fs.exists(new Path(s"$dir/bands/.old-$v")) &&
      !fs.exists(new Path(s"$dir/bands/.compact-$v")))
    assert(probed() == pBefore, "healed index must probe identically")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("same-session save-overwrite rep loop never serves a stale listing") {
    // the bench rep loop that flaked once in 160 queries: rep N's
    // save(overwrite) deletes rep N-1's files, and without the
    // entry-point refresh (PartitionedStore.refresh) the session's
    // FileStatusCache could hand rep N's probe the dead listing →
    // FILE_NOT_EXIST at execution. Three full save→probe reps over the
    // SAME dir must agree and never throw.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_band_reps").toString
    val batch = docs.filter(col("doc_id") < 25)
      .select((col("doc_id") + 70000L).as("doc_id"), col("text"))
    val reps = (1 to 3).map { _ =>
      BandIndex.save(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, dir = dir)
      val p = pairSet(BandIndex.probe(spark, dir, batch,
        "doc_id", "text", threshold = 0.8))
      BandIndex.compact(spark, dir, minFiles = 2)
      p
    }
    assert(reps.distinct.size == 1, "every rep must return the same pair set")
    assert(reps.head.nonEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
