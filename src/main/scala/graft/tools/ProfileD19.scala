package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth law for d19 CDC chunk dedup: corpus ×f by the ProfileD17
  * permutation synthesis over sf0.1 documents (5 000 docs/replica;
  * a letter bijection maps each replica's text to fresh strings, so
  * chunk hashes stay replica-local and planted duplication — each
  * replica's own 'XX '-prefixed clones of its first 500 docs — is
  * constant per replica). Chunk counts, dup chunks, and dup chars
  * should grow LINEARLY (per-row hashing + boundary walk; the only
  * exchange is the chunks-sized hash groupBy), and the clone
  * dup-fraction should stay ~flat (resync is per-document).
  *
  * Run: sbt "runMain graft.tools.ProfileD19 /root/testdata/sf0.1 1,3,10"
  * Results: SCALE.md round-16; log under bench_runs/profile_r16/.
  */
object ProfileD19 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def perm(s: String, seed: Int): String = {
      val r = new scala.util.Random(seed)
      r.shuffle(s.toList).mkString
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    println("factor,docs,n_chunks,dup_chunks,dup_chars,clone_dup_frac,secs")
    for (f <- factors) {
      val replicas = (0 until f).map { c =>
        val r = if (c == 0) base
          else base.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"),
            translate(col("text"), lower, perm(lower, 3 * c + 1)).as("text"))
        // clone ids stay INSIDE the replica's 10M band (+1M, the
        // ProfileD17 convention) — a flat +20M offset collides with
        // later replicas' original ids and merges distinct docs in
        // the per-doc groupBys (the first run's super-linear counts)
        r.unionByName(r.filter(col("doc_id") % 10000000L < 500)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("XX "), col("text")).as("text")))
      }
      val corpus = replicas.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = corpus.count()
      val (row, t) = time {
        graft.functions.DedupFunctions
          .cdcChunks(corpus, "doc_id", "text", window = 8, avgMask = 16, minLen = 8)
          .agg(sum(col("n_chunks").cast("long")),
            sum(col("dup_chunks").cast("long")),
            sum(col("dup_chars").cast("long")),
            round(avg(when(col("doc_id") % 10000000L >= 1000000L,
              col("dup_chunks").cast("double") / col("n_chunks"))), 4))
          .head()
      }
      println(f"$f,$nDocs,${row.getLong(0)},${row.getLong(1)}," +
        f"${row.getLong(2)},${row.getDouble(3)},$t%.2f")
      corpus.unpersist(blocking = false)
    }
    spark.stop()
  }
}
