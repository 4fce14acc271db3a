package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.DedupFunctions._

/** Phase timing of the REAL jaccardPairs structure (hashed join keys,
  * same filters/bounds — unlike ProfileD4's string-keyed
  * reconstruction) on the scaled corpus. Phases are materialized
  * separately, which changes pipelining vs the production single-job
  * plan — use the numbers to LOCATE cost, and ProfileD4b for the true
  * end-to-end. Verify arms run shuffle-hash vs broadcast back to back
  * on the same persisted candidates.
  *
  * Run: `java -cp ... graft.tools.ProfileD4c /root/testdata/sf0.1 10` */
object ProfileD4c {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).getOrElse("10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // scaled corpus, ProfileScale synthesis
    val base = documents(spark, d).select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_d4c")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      if (Files.exists(tmp))
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    val p = s"$tmp/docs_x$factor"
    (0 until factor).map { c =>
      if (c == 0) base
      else base.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"),
        translate(col("text"), lower + upper + digits,
          rot(lower, c * 7) + rot(upper, c * 7) + rot(digits, c * 3)).as("text"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
    val input = spark.read.parquet(p).filter(length(col("text")) >= 5)
    time("corpus count")(println(s"  docs: ${input.count()}"))

    val threshold = 0.4
    def ceilT(n: org.apache.spark.sql.Column) =
      ceil(lit(threshold) * n - lit(1e-9))
    def ceil2T(n: org.apache.spark.sql.Column) =
      ceil(lit(2 * threshold / (1 + threshold)) * n - lit(1e-9))

    val sh = input.select(col("doc_id").as("__id"),
        charShingles(col("text"), 5).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hstat = time("phase 1: sh materialize + stats agg") {
      sh.agg(count(lit(1)).cast("long").as("n"),
        coalesce(avg(size(col("__sh"))), lit(0.0)).as("sz")).head()
    }
    println(s"  docs ${hstat.getLong(0)}  avg set ${hstat.getDouble(1)}%.1f")

    val tok = sh.select(col("__id"), size(col("__sh")).as("__na"),
        explode(col("__sh")).as("__s"))
      .withColumn("__sk", xxhash64(col("__s")))
    val dfreq = tok.groupBy("__sk").agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy("__id").orderBy(col("__df"), col("__s"))
    val prefix = tok.join(dfreq, Seq("__sk"))
      .withColumn("__rn", row_number().over(byRarity))
      .filter(col("__rn") <= col("__na") - ceilT(col("__na")) + 1)
      .select(col("__id"), col("__sk"), col("__s"), col("__rn"), col("__na"),
        (col("__rn") <= col("__na") - ceil2T(col("__na")) + 1).as("__ix"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("phase 2: rank + prefix (persisted)")(println(s"  prefix rows: ${prefix.count()}"))

    val cand = prefix.filter(col("__ix")).drop("__ix")
      .toDF("__pa", "__sk", "__sa", "__ra", "__naa")
      .join(prefix.drop("__ix").toDF("__pb", "__sk", "__sb", "__rb", "__nab"),
        Seq("__sk"))
      .filter(col("__sa") === col("__sb"))
      .filter((col("__naa") < col("__nab") ||
          (col("__naa") === col("__nab") && col("__pa") < col("__pb"))) &&
        col("__nab") >= ceilT(col("__naa")) &&
        col("__naa") >= ceilT(col("__nab")) &&
        lit(1) + least(col("__naa") - col("__ra"), col("__nab") - col("__rb")) >=
          ceil(lit(threshold / (1 + threshold)) * (col("__naa") + col("__nab")) - lit(1e-9)) -
            ceil(lit(0.05) * (col("__naa") + col("__nab"))))
      .groupBy("__pa", "__pb", "__naa", "__nab")
      .agg(count(lit(1)).as("__s"), max("__ra").as("__mra"), max("__rb").as("__mrb"))
      .filter(col("__s") +
          least(col("__naa") - col("__mra"), col("__nab") - col("__mrb")) >=
        ceil(lit(threshold / (1 + threshold)) * (col("__naa") + col("__nab")) - lit(1e-9)))
      .select(least(col("__pa"), col("__pb")).as("a"),
        greatest(col("__pa"), col("__pb")).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("phase 3: candidate join + group bound")(println(s"  candidates: ${cand.count()}"))

    val hsh = sh.select(col("__id"),
        graft.expressions.HashExpressions.hashed_set40(col("__sh")).as("__hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("phase 4: hashed sets (persisted)")(hsh.count())

    val hshA = hsh.select(col("__id").as("a"), col("__hs").as("__sha"))
    val hshB = hsh.select(col("__id").as("b"), col("__hs").as("__shb"))
    def verify(ja: org.apache.spark.sql.DataFrame,
               jb: org.apache.spark.sql.DataFrame): Long =
      cand.join(ja, Seq("a")).join(jb, Seq("b"))
        .withColumn("jac", graft.expressions.HashExpressions.sorted_long_jaccard(
          col("__sha"), col("__shb")))
        .filter(col("jac") >= threshold).count()
    time("phase 5a: verify shuffle_hash") {
      println(s"  pairs: ${verify(hshA.hint("shuffle_hash"), hshB.hint("shuffle_hash"))}")
    }
    time("phase 5b: verify broadcast") {
      println(s"  pairs: ${verify(broadcast(hshA), broadcast(hshB))}")
    }
    time("phase 5c: verify default (AQE picks)") {
      println(s"  pairs: ${verify(hshA, hshB)}")
    }
    spark.stop()
  }
}
