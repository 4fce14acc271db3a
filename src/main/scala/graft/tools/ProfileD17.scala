package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth law for d17 exact substring dedup: corpus ×f via the
  * ProfileScale permutation synthesis, each replica carrying its OWN
  * whole-doc copies (docs < 50, +10000000·c ids) so planted
  * duplication is constant per replica — gram relation, marked
  * spans, and removed chars should all grow LINEARLY, and the
  * canonical-gram groups stay replica-local (a permutation bijection
  * maps replica grams to fresh strings, so no cross-replica gram
  * sharing beyond the 26^(5−s) boundary-gram ceiling measured in
  * ProfileD4bResidue). Both arms timed: string keys (oracle-exact
  * form) and xxhash64 keys (the 100 TB exchange diet).
  *
  * Run: sbt "runMain graft.tools.ProfileD17 /root/testdata/sf0.1 1,3,10"
  * Results: SCALE.md round-16.
  */
object ProfileD17 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
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
    println("factor,docs,grams,arm,secs,docs_touched,spans,chars_removed")
    for (f <- factors) {
      val replicas = (0 until f).map { c =>
        val r = if (c == 0) base
          else base.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"),
            translate(col("text"), lower, perm(lower, 3 * c + 1)).as("text"))
        r.unionByName(r.filter(col("doc_id") % 10000000L < 50)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      }
      val corpus = replicas.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = corpus.count()
      val nGrams = corpus.filter(length(col("text")) >= 40)
        .select((length(col("text")) - 39).cast("long").as("n"))
        .agg(sum("n")).head().getLong(0)
      for (hashed <- Seq(false, true)) {
        val (row, t) = time {
          val out = graft.functions.DedupFunctions
            .exactSubstringDedup(corpus, "doc_id", "text", L = 40, hashKeys = hashed)
          out.agg(sum(when(col("n_spans") > 0, 1L).otherwise(0L)),
              sum(col("n_spans").cast("long")),
              sum(col("chars_removed").cast("long")))
            .head()
        }
        println(s"$f,$nDocs,$nGrams,${if (hashed) "hash" else "string"}," +
          f"$t%.1f,${row.getLong(0)},${row.getLong(1)},${row.getLong(2)}")
      }
      corpus.unpersist(blocking = false)
    }
    spark.stop()
  }
}
