package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.Tables._

/** Scale measurement for streamNearDup — the streaming twin of
  * ProfileScale's batch d2 cell. Replays the (rotation-replica scaled)
  * corpus through a MemoryStream in fixed-size micro-batches and
  * records, per batch: wall latency, cumulative verify comparisons,
  * and the state-member gauge (NearDupTelemetry) plus Spark's own
  * state-row count from StreamingQueryProgress.
  *
  * The growth law under test: per-arrival work ∝ its bands' member
  * counts (the LSH banding contract) — so TTL-less per-batch latency
  * may creep with accumulated state, while a TTL'd run (second phase)
  * must hold state flat (processing-time eviction between batches).
  *
  * Run: `sbt "runMain graft.tools.ProfileStream /root/testdata/sf0.1 1,3,10"`
  * Results: SCALE.md. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val batchSize = args.lift(2).getOrElse("5000").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false") // streaming plans
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = documents(spark, d).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    println(s"base corpus: ${base.size} docs ($d)")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    def rotText(t: String, c: Int): String = {
      if (c == 0) t
      else {
        val from = lower + upper + digits
        val to = rot(lower, c * 7) + rot(upper, c * 7) + rot(digits, c * 3)
        val m = from.zip(to).toMap
        t.map(ch => m.getOrElse(ch, ch))
      }
    }
    def corpus(f: Int): Seq[(Long, String)] =
      (0 until f).flatMap(c => base.map { case (id, t) =>
        (id + c * 10000000L, rotText(t, c)) })

    case class Cell(mode: String, factor: Int, docs: Int, batches: Int,
                    firstSec: Double, medianSec: Double, lastSec: Double,
                    pairs: Long, comparisons: Long, stateMembers: Long)
    val cells = scala.collection.mutable.ArrayBuffer[Cell]()

    def run(mode: String, f: Int, ttl: Option[String],
            interBatchSleepMs: Long, batch: Int = batchSize,
            provider: Option[String] = None): Unit = {
      provider.foreach(p =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      val docs = corpus(f)
      val mem = MemoryStream[(Long, String)]
      val telem = graft.streaming.StreamOps.NearDupTelemetry(spark)
      val out = graft.streaming.StreamOps.streamNearDup(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8,
        stateTTL = ttl,
        trigger = ttl.map(_ => "500 milliseconds"), telemetry = Some(telem))
      val sink = s"stream_scale_${mode}_x$f"
      // a TTL'd stateful query MUST set a trigger interval: with the
      // default as-fast-as-possible trigger, processing-time timeouts
      // make the engine fire continuous EMPTY micro-batches whenever
      // the source is idle (each one a full state scan + commit) —
      // measured here as ~850% CPU of pure empty-batch churn during
      // the inter-batch sleeps, hundreds of stages per minute doing
      // nothing. A bounded trigger caps the churn at 1/interval.
      val writer = out.toDF("doc_id", "dup_of", "jac")
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(sink)
      val q = (if (ttl.isDefined)
          writer.trigger(org.apache.spark.sql.streaming.Trigger
            .ProcessingTime("500 milliseconds"))
        else writer).start()
      val lat = scala.collection.mutable.ArrayBuffer[Double]()
      try {
        docs.grouped(batch).foreach { b =>
          val t0 = System.nanoTime()
          mem.addData(b: _*)
          q.processAllAvailable()
          lat += (System.nanoTime() - t0) / 1e9
          if (interBatchSleepMs > 0) Thread.sleep(interBatchSleepMs)
        }
        // one drained extra trigger so processing-time timeouts from
        // the sleep horizon actually fire before we read the gauge
        if (ttl.isDefined) { mem.addData(docs.head); q.processAllAvailable() }
        val pairs = spark.table(sink).count()
        val sorted = lat.sorted
        val c = Cell(mode, f, docs.size, lat.size,
          lat.head, sorted(sorted.size / 2), lat.last,
          pairs, telem.comparisons.value, telem.stateMembers)
        cells += c
        println(f"$mode%-8s x$f%-3d docs ${c.docs}%7d  batches ${c.batches}%3d  " +
          f"first ${c.firstSec}%5.1f s  median ${c.medianSec}%5.1f s  last ${c.lastSec}%5.1f s  " +
          f"pairs ${c.pairs}%7d  cmp ${c.comparisons}%9d  state ${c.stateMembers}%8d")
      } finally q.stop()
    }

    // warm codegen/state-store paths
    run("warm", 1, None, 0)
    cells.clear()
    if (!args.contains("--ttl-only"))
      for (f <- factors) run("nottl", f, None, 0)
    // TTL'd: state bounded to ~recent batches (eviction between
    // batches via processing-time timeout + sleep past the horizon).
    // DELIBERATELY TINY: a 1 s TTL with sleeps past the horizon is
    // the worst-case eviction storm — EVERY band expires EVERY batch
    // — and the default HDFS-backed state store pays O(total state)
    // PER TRIGGER regardless (it clones the full version map and
    // commits a delta file per partition each trigger, measured as
    // minutes per batch at 240k members / 400 MB of band state; see
    // SCALE.md). The cells below bound state at ~16k members so both
    // providers finish fast, and run HDFS vs RocksDB back to back —
    // RocksDB is the production store for large streaming-dedup
    // state precisely because its commits are incremental.
    run("ttl1s-hdfs", 1, Some("1 second"), 1500, batch = 1000)
    run("ttl1s-rocks", 1, Some("1 second"), 1500, batch = 1000,
      provider = Some("org.apache.spark.sql.execution.streaming" +
        ".state.RocksDBStateStoreProvider"))

    println("\nmode,factor,docs,batches,first_s,median_s,last_s,pairs,comparisons,state_members")
    cells.foreach(c => println(s"${c.mode},${c.factor},${c.docs},${c.batches}," +
      f"${c.firstSec}%.2f,${c.medianSec}%.2f,${c.lastSec}%.2f," +
      s"${c.pairs},${c.comparisons},${c.stateMembers}"))
    spark.stop()
  }
}
