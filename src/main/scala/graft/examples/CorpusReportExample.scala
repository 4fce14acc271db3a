package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus health report from mergeable summaries — the sketch family
  * composed the way a monitoring pipeline would run it daily:
  *
  *   per-source KMV sketches → distinct-vocabulary counts and pairwise
  *   source overlaps (no token-level join) → Misra-Gries frequent
  *   tokens per source rolled up to a global top-10 (no second corpus
  *   pass) → snapshot diff vs yesterday's corpus (what must re-enter
  *   dedup) → distinct active users per hour from the events stream
  *   (KMV inside event-time windows).
  *
  * The point at 100 TB: every report after the first scan reads
  * SKETCH BLOBS, not data. The per-source sketches are ≤ 128 KB each —
  * persist them once per shard/day and the overlap matrix, the global
  * rollups, and day-over-day vocabulary drift all come from merging
  * kilobytes.
  *
  * Run: sbt "runMain graft.examples.CorpusReportExample [sfDir]"
  */
object CorpusReportExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-corpus-report-example")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.expressions.SketchExpressions._
    import graft.expressions.FreqSketchExpressions._

    val docs = graft.Tables.documents(spark, sfDir)

    // 1. ONE corpus pass builds every per-source summary: a KMV
    //    distinct sketch and an MG frequency sketch per source.
    val summaries = docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source")
      .agg(kmv_sketch(col("t"), 16384).as("vocab_sk"),
        mg_sketch(col("t"), 4096).as("freq_sk"))
      .persist()

    println("== per-source distinct vocabulary (from sketches) ==")
    summaries
      .select(col("source"), kmv_estimate(col("vocab_sk")).as("n_distinct"))
      .orderBy("source").show(5)

    // 2. Pairwise vocabulary overlap — sketch blobs only, S² pairs.
    println("== source-pair vocabulary overlap ==")
    val a = summaries.select(col("source").as("sa"), col("vocab_sk").as("ska"))
    val b = summaries.select(col("source").as("sb"), col("vocab_sk").as("skb"))
    a.join(b, col("sa") < col("sb"))
      .select(col("sa"), col("sb"),
        kmv_intersect(col("ska"), col("skb")).as("common"),
        kmv_estimate(kmv_union(col("ska"), col("skb"))).as("union"))
      .orderBy("sa", "sb").show(5)

    // 3. Global frequent tokens: merge the per-source MG blobs — the
    //    corpus is NOT re-read.
    println("== global top-10 tokens (rolled up from per-source sketches) ==")
    summaries.agg(mg_merge(col("freq_sk")).as("sk"))
      .select(explode(mg_topk(col("sk"), 10)).as("e"))
      .select(col("e.item").as("token"), col("e.count").as("n"))
      .show(10)

    // 4. Day-over-day snapshot diff: yesterday = today minus a slice,
    //    plus edits (synthesized here; in production, two table
    //    versions). Only added/changed docs re-enter dedup/indexing.
    val yesterday = docs.select("doc_id", "text")
    val today = yesterday.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" updated")))
          .otherwise(col("text")).as("text"))
    println("== snapshot diff (docs per status) ==")
    graft.functions.DedupFunctions
      .corpusDiff(yesterday, today, "doc_id", "text")
      .groupBy("status").count().orderBy("status").show()

    // 5. Distinct active users per hour — the KMV sketch inside
    //    event-time windows (the same expression runs under
    //    readStream with a watermark).
    println("== distinct users per hour (first 5 windows) ==")
    graft.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(kmv_estimate(kmv_sketch(col("user_id"), 4096)).as("n_users"))
      .select(col("window.start").as("hour"), col("n_users"))
      .orderBy("hour").show(5)

    summaries.unpersist()
    spark.stop()
  }
}
