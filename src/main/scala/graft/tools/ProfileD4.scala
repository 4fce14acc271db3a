package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.DedupFunctions._

/** Stage-level profiler for the prefix-filtered Jaccard pipeline (d4b)
  * — not part of the driver contract; run with
  * `sbt "runMain graft.tools.ProfileD4 /root/testdata/sf0.1"`. */
object ProfileD4 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val t = 0.4
    // `--factor N` scales the corpus with ProfileScale's
    // rotation-replica synthesis so the stage breakdown can be read at
    // the SCALE.md factors, not just the base corpus
    val factor = args.sliding(2).collectFirst {
      case Array("--factor", n) => n.toInt }.getOrElse(1)
    val baseDocs = documents(spark, d)
    val docs = if (factor == 1) baseDocs else {
      val tmp = java.nio.file.Files.createTempDirectory("graft_d4prof")
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
        if (c == 0) baseDocs.select("doc_id", "text")
        else baseDocs.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper + digits,
            rot(lower, c * 7) + rot(upper, c * 7) + rot(digits, c * 3)).as("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val input = docs.filter(length(col("text")) >= 5)
    time("warm: docs count")(input.count())
    if (args.contains("--pipeline-only")) {
      // clean end-to-end number: no profiler-persisted stages for the
      // cache manager to reuse
      time("full jaccardPairs (clean)") {
        val p = jaccardPairs(input, "doc_id", "text", charShingles(_, 5), t)
        p.count(); p.unpersist(blocking = false)
      }
      spark.stop(); return
    }
    val sh = input.select(col("doc_id").as("__id"),
        array_sort(charShingles(col("text"), 5)).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle sets (persisted)")(sh.count())
    val tok = sh.select(col("__id"), size(col("__sh")).as("__na"),
      explode(col("__sh")).as("__s"))
    time("token explode")(tok.count())
    val dfreq = tok.groupBy("__s").agg(count(lit(1)).as("__df"))
    val prefix = tok.join(dfreq, Seq("__s"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__df"), col("__s"))))
      .filter(col("__rn") <= col("__na") - ceil(lit(t) * col("__na")) + 1)
      .select(col("__id"), col("__s"), col("__rn"), col("__na"),
        (col("__rn") <= col("__na") - ceil(lit(2 * t / (1 + t)) * col("__na") - lit(1e-9)) + 1).as("__ix"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("rank + prefix (persisted)")(prefix.count())
    // index-prefix × standard-prefix + group positional bound — the
    // jaccardPairs candidate stage (string join key here; the real
    // path keys on xxhash64 with a string-equality collision reject)
    val cand = prefix.filter(col("__ix")).drop("__ix")
      .toDF("__pa", "__s", "__ra", "__naa")
      .join(prefix.drop("__ix").toDF("__pb", "__s", "__rb", "__nab"), Seq("__s"))
      .filter((col("__naa") < col("__nab") ||
          (col("__naa") === col("__nab") && col("__pa") < col("__pb"))) &&
        col("__nab") >= ceil(lit(t) * col("__naa")) &&
        col("__naa") >= ceil(lit(t) * col("__nab")) &&
        lit(1) + least(col("__naa") - col("__ra"), col("__nab") - col("__rb")) >=
          ceil(lit(t / (1 + t)) * (col("__naa") + col("__nab")) - lit(1e-9)) -
            ceil(lit(0.05) * (col("__naa") + col("__nab"))))
      .groupBy("__pa", "__pb", "__naa", "__nab")
      .agg(count(lit(1)).as("__s"), max("__ra").as("__mra"), max("__rb").as("__mrb"))
      .filter(col("__s") +
          least(col("__naa") - col("__mra"), col("__nab") - col("__mrb")) >=
        ceil(lit(t / (1 + t)) * (col("__naa") + col("__nab")) - lit(1e-9)))
      .select(least(col("__pa"), col("__pb")).as("a"),
        greatest(col("__pa"), col("__pb")).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("candidate join + group bound")(println(s"  candidates: ${cand.count()}"))
    if (!args.contains("--hashed-only")) {
    time("verify (array join + merge walk)") {
      cand.join(sh.select(col("__id").as("a"), col("__sh").as("__sha")), Seq("a"))
        .join(sh.select(col("__id").as("b"), col("__sh").as("__shb")), Seq("b"))
        .withColumn("jac", graft.expressions.HashExpressions.sorted_jaccard(
          col("__sha"), col("__shb")))
        .filter(col("jac") >= t).count()
    }
    time("verify w/ broadcast arrays") {
      cand.join(broadcast(sh.select(col("__id").as("a"), col("__sh").as("__sha"))), Seq("a"))
        .join(broadcast(sh.select(col("__id").as("b"), col("__sh").as("__shb"))), Seq("b"))
        .withColumn("jac", graft.expressions.HashExpressions.sorted_jaccard(
          col("__sha"), col("__shb")))
        .filter(col("jac") >= t).count()
    }
    }
    val hsh = sh.select(col("__id"),
        graft.expressions.HashExpressions.hashed_set40(col("__sh")).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("hashed long sets (persisted, kernel)")(hsh.count())
    time("verify w/ hashed long arrays (shuffle)") {
      cand.join(hsh.select(col("__id").as("a"), col("__sh").as("__sha")), Seq("a"))
        .join(hsh.select(col("__id").as("b"), col("__sh").as("__shb")), Seq("b"))
        .withColumn("jac", graft.expressions.HashExpressions.sorted_long_jaccard(
          col("__sha"), col("__shb")))
        .filter(col("jac") >= t).count()
    }
    time("verify w/ hashed long arrays (broadcast)") {
      cand.join(broadcast(hsh.select(col("__id").as("a"), col("__sh").as("__sha"))), Seq("a"))
        .join(broadcast(hsh.select(col("__id").as("b"), col("__sh").as("__shb"))), Seq("b"))
        .withColumn("jac", graft.expressions.HashExpressions.sorted_long_jaccard(
          col("__sha"), col("__shb")))
        .filter(col("jac") >= t).count()
    }
    time("full jaccardPairs (fresh)") {
      val p = jaccardPairs(input, "doc_id", "text", charShingles(_, 5), t)
      p.count(); p.unpersist(blocking = false)
    }
    spark.stop()
  }
}
