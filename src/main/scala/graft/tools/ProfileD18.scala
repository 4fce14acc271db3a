package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth law for d18 fuzzy join: the three sf dirs give a natural
  * ×1/×10/×100 customer-name ladder (150 / 1 500 / 15 000 distinct
  * names, k = 1, q = 2). Per cell and arm: candidate rows (the
  * pre-verify join output — fuzzyCandidates, the exact relation the
  * operator pays for), verified pairs, wall.
  *
  * The asymmetry IS the law: on a boilerplate-prefix key corpus the
  * band arm joins through the shared "Customer#0…" grams — candidates
  * ∝ names² × name-length — while the prefix arm joins only each
  * name's kq+1 rarest (gram, occ) elements — candidates ∝
  * Σ_rare-element cnt². The band arm is therefore only taken to ×10
  * (its ×100 cell is ~10¹⁰ rows by construction, not a measurement
  * worth a machine-hour; the arm exists for selective-gram corpora
  * like d18's part names).
  *
  * Run: sbt "runMain graft.tools.ProfileD18"
  * Results: SCALE.md round-16; log under bench_runs/profile_r16/.
  */
object ProfileD18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    println("factor,sf,names,arm,cand_rows,pairs,secs")
    val cells = Seq((1, "sf0.001"), (10, "sf0.01"), (100, "sf0.1"))
    // third arm: d20's ER blocking (nation) on top of the prefix
    // filter — candidates should divide by ~the block count, the
    // block riding the join keys
    val arms = Seq(("band", false, None: Option[String]),
      ("prefix", true, None: Option[String]),
      ("prefix+block", true, Some("c_nationkey")))
    for ((f, sf) <- cells) {
      val cust = spark.read.parquet(s"/root/testdata/$sf/customer.parquet")
      val names = cust.select(countDistinct(col("c_name"))).head().getLong(0)
      for ((arm, prefixArm, blk) <- arms) {
        // the band arm's ×100 cell is skipped by design (see scaladoc)
        if (prefixArm || f < 100) {
          val (cands, _) = time {
            graft.functions.DedupFunctions
              .fuzzyCandidates(cust, "c_name", maxDist = 1, q = 2, prefixArm, blk)
              .count()
          }
          val (pairs, t) = time {
            graft.functions.DedupFunctions
              .fuzzyPairs(cust, "c_name", maxDist = 1, q = 2, prefixArm, blk)
              .count()
          }
          println(f"$f,$sf,$names,$arm,$cands,$pairs,$t%.2f")
        }
      }
    }
    spark.stop()
  }
}
