package graft.tools

/** r15 finding #2 quantitative pin — pure driver microbench, no
  * Spark: the BandIndex.probe prefix match at the measured ×100
  * big-batch dial (bandprobe_x100_pl4_bigbatch.log: 65 536 live dirs,
  * 45 192 batch base buckets). Times the pre-r16 form
  * (`baseBuckets.exists(v.startsWith)` — O(dirs × buckets) string
  * compares) against the shipped form
  * (`baseBuckets.contains(v.take(pl))` — O(dirs) hash lookups).
  * Correctness of the refactor is pinned by BandIndexSpec probe
  * equality; this records the removed driver term's size.
  *
  * Run: sbt "runMain graft.tools.CheckPrefixMatch"
  */
object CheckPrefixMatch {
  def main(args: Array[String]): Unit = {
    val pl = 4
    val hex = "0123456789abcdef"
    // all 16^4 dir values (the ×100 store), a few rebucket-deepened
    val dirs: Seq[String] = (for {
      a <- hex; b <- hex; c <- hex; d <- hex
    } yield s"$a$b$c$d") ++ Seq("0a1b5", "0a1b6", "ffff0")
    // 45 192 base buckets: the big-batch probe's distinct prefixes
    val rnd = new scala.util.Random(42)
    val baseBuckets: Set[String] =
      rnd.shuffle(dirs.filter(_.length == pl)).take(45192).toSet
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // JIT warm on a small slice
    val warmDirs = dirs.take(1000)
    (1 to 3).foreach { _ =>
      warmDirs.count(v => baseBuckets.exists(v.startsWith))
      warmDirs.count(v => baseBuckets.contains(v.take(pl)))
    }
    println(s"dirs=${dirs.size} baseBuckets=${baseBuckets.size} (pl=$pl)")
    for (rep <- 1 to 3) {
      val (nOld, tOld) = time(dirs.count(v => baseBuckets.exists(v.startsWith)))
      val (nNew, tNew) = time(dirs.count(v => baseBuckets.contains(v.take(pl))))
      require(nOld == nNew, s"forms disagree: $nOld vs $nNew")
      println(f"rep $rep: matched=$nNew  old exists/startsWith ${tOld}%8.3f s   " +
        f"new contains/take ${tNew}%8.5f s   ratio ${tOld / tNew}%9.0fx")
    }
  }
}
