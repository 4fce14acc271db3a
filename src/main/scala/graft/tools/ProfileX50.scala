package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale law for the x50 blocklist pass: wall-clock vs term-list size
  * P for (a) the Aho-Corasick automaton arm (ONE O(|text|) walk, P a
  * free variable) and (b) the naive per-term `contains` chain
  * (O(P·|text|) — the corpus is re-scanned once per term). The chain
  * arm computes the strictly CHEAPER per-term boolean (present/not,
  * no counting), so the comparison is conservative: AC counts every
  * overlapping occurrence of every term and must still win.
  *
  * Terms are deterministic two-word phrases over the corpus
  * vocabulary (md5-ordered, so every P is a fixed prefix of the same
  * list and phrases genuinely occur in the text). The corpus is the
  * sf documents table replicated ×R with fresh doc_ids (same text
  * bytes — the scan term is what's being measured, not dedup).
  *
  * Run: sbt "runMain graft.tools.ProfileX50 /root/testdata/sf0.1 64 12,100,1000 3"
  * Results: SCALE.md round-17; log under bench_runs/profile_r17/.
  */
object ProfileX50 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rFactor = args.lift(1).getOrElse("64").toInt
    val ps = args.lift(2).getOrElse("12,100,1000").split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(3).getOrElse("3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = Seq("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch", "stream",
      "spark", "dup", "group", "query", "row", "data", "slow", "filter",
      "customer", "line", "value", "agg", "column", "big", "vector")
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val phrases = (for (a <- vocab; b <- vocab) yield s"$a $b")
      .distinct.sortBy(md5hex)

    val base = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("t"))
    val corpus = base.crossJoin(spark.range(rFactor).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"), col("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = corpus.count()
    println(s"docs=$nDocs replicas=$rFactor")

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    println("arm,P,build_s,med_s,runs,terms_present_sum")
    for (p <- ps) {
      val terms = phrases.take(p)
      // automaton arm: terms-present per doc via ONE walk
      val (bt0, buildS) = time {
        new graft.expressions.AcAutomaton(terms.toArray); 1L
      }
      require(bt0 == 1L)
      import graft.expressions.KeywordExpressions.keywordCounts
      val acRuns = (1 to reps).map { _ =>
        val (s, t) = time {
          corpus.select(size(filter(keywordCounts(col("t"), terms), _ > lit(0)))
              .cast("long").as("n"))
            .agg(sum(col("n"))).head().getLong(0)
        }
        (s, t)
      }
      // contains chain: the same terms-present count, one scan per
      // term. NOTE the balanced reduce: the natural left fold
      // `cols.reduce(_ + _)` builds a P-deep Add tree and the planner
      // STACK-OVERFLOWS at P=1000 before a single row is read — the
      // naive formulation fails structurally before it fails on cost.
      def balancedSum(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
        if (cs.size == 1) cs.head
        else balancedSum(cs.grouped(2).map(_.reduce(_ + _)).toSeq)
      val chainRuns = (1 to reps).map { _ =>
        val (s, t) = time {
          val presentCols = terms.map(w =>
            when(col("t").contains(lit(w)), 1L).otherwise(0L))
          corpus.select(balancedSum(presentCols).as("n"))
            .agg(sum(col("n"))).head().getLong(0)
        }
        (s, t)
      }
      require(acRuns.map(_._1).distinct.size == 1 &&
        acRuns.head._1 == chainRuns.head._1,
        s"arms disagree at P=$p: ac=${acRuns.head._1} chain=${chainRuns.head._1}")
      println(f"ac,$p,$buildS%.3f,${med(acRuns.map(_._2))}%.3f,${acRuns.map(r => f"${r._2}%.2f").mkString("|")},${acRuns.head._1}")
      println(f"chain,$p,0.000,${med(chainRuns.map(_._2))}%.3f,${chainRuns.map(r => f"${r._2}%.2f").mkString("|")},${chainRuns.head._1}")
    }
    spark.stop()
  }
}
