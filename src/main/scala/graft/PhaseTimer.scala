package graft

/** Wall-clock per-phase breakdown for the multi-phase "lifecycle
  * bundle" queries (r16 judge finding #2): a bundle query is 5–11
  * phases (save / ingest / replay / compact / rebucket / probe) but
  * Bench records only the bundle total, so "which phase moved" was
  * unanswerable from artifacts when a bundle's wall swung between
  * rounds. Each bundle lambda opens a record with [[start]] and wraps
  * its internal actions in the returned recorder; [[Bench]] drains the
  * record after every counted sample and publishes per-phase medians
  * in the snapshot JSON next to `cpu`.
  *
  * Memory contract: [[start]] REPLACES the query's in-flight record,
  * so non-Bench callers (Verify, specs) that never drain hold at most
  * one record per query — nothing grows with call count. Phase names
  * repeat freely (s11 snapshots stats four times); [[drain]] sums
  * same-named phases, preserving first-occurrence order, so a record
  * reads as "total seconds per phase kind".
  */
object PhaseTimer {
  final class Rec private[PhaseTimer] (
      query: String,
      buf: scala.collection.mutable.ArrayBuffer[(String, Double)]) {
    /** Run `body`, appending its wall seconds under `name`. Also
      * labels the phase's Spark jobs (`"<query>: <name>"`, guide §1.5)
      * so the UI and job-level profilers (tools/ProfileJobs) attribute
      * every job to its phase; the label is thread-local and restored
      * after the phase, so the residual exec jobs stay unlabeled. */
    def apply[T](name: String)(body: => T): T = {
      val sc = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sparkContext)
      // restore the PREVIOUS label, not null: nested/interleaved
      // phases on one thread keep the outer phase's label (ADVICE r18)
      val prev = sc.map(_.getLocalProperty("spark.job.description"))
      sc.foreach(_.setJobDescription(s"$query: $name"))
      val t0 = System.nanoTime()
      try body
      finally {
        buf.synchronized { buf += name -> ((System.nanoTime() - t0) / 1e9) }
        sc.zip(prev).foreach { case (c, p) => c.setJobDescription(p) }
      }
    }
  }

  private val runs = new java.util.concurrent.ConcurrentHashMap[
    String, scala.collection.mutable.ArrayBuffer[(String, Double)]]()

  def start(query: String): Rec = {
    val buf = new scala.collection.mutable.ArrayBuffer[(String, Double)]()
    runs.put(query, buf)
    new Rec(query, buf)
  }

  /** Remove and return the query's record: (phase, total seconds) in
    * first-occurrence order, same-named phases summed. Empty when the
    * query recorded nothing (non-bundle queries). */
  def drain(query: String): Seq[(String, Double)] = {
    val raw = Option(runs.remove(query)).map(b => b.synchronized(b.toSeq))
      .getOrElse(Seq.empty)
    val order = scala.collection.mutable.LinkedHashMap[String, Double]()
    raw.foreach { case (n, s) => order(n) = order.getOrElse(n, 0.0) + s }
    order.toSeq
  }
}
