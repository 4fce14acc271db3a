package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.DedupFunctions.charShingles

/** r15 item 5: attribute the d4b candidate law's +29 % excess at ×100
  * WITHOUT re-paying the 72 GB candidate join. The r15 SCALE.md
  * attributed it to "punctuation/space grams fixed by `translate`" —
  * but the fixture corpus contains NO punctuation (lowercase words +
  * single spaces only), so the residue is exactly the grams the
  * synthesis CANNOT permute: a replica bijection must fix ' ' (the
  * shared corpus also feeds word-gram cells), so a char-5-gram with
  * s spaces has ≤ 26^(5−s) distinct images and replicas collide on
  * the low-letter-entropy boundary grams (s ≥ 2 → ≤ 676 patterns per
  * space template). This profiler measures that class directly:
  *
  * per factor ×f it rebuilds the ProfileScale synthesis corpus and
  * reports, for the d4b prefix relation (same rarity-ranked prefix +
  * index-flag construction as the cand phase), split by
  * space-count class (s ≥ 2 vs s ≤ 1):
  *   - distinct grams and max/total df (does the class's df grow
  *     ∝ corpus?)
  *   - Σ_g nIx(g)·nStd(g) — the candidate-join upper bound each
  *     class feeds, i.e. where the excess candidates come from
  *
  * The join itself (length-ratio + positional filters + group bound)
  * only SHRINKS each class, so a class carrying ~the measured ×100
  * excess in its upper bound while the other stays linear is the
  * attribution. Results: SCALE.md round-16.
  *
  * Run: sbt "runMain graft.tools.ProfileD4bResidue /root/testdata/sf0.1 1,10,100"
  */
object ProfileD4bResidue {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    val tmp = java.nio.file.Files.createTempDirectory("graft_d4bres")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      if (Files.exists(tmp))
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
    val base = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def perm(s: String, seed: Int): String = {
      val r = new scala.util.Random(seed)
      r.shuffle(s.toList).mkString
    }
    val t0v = 0.4
    for (f <- factors) {
      val p = s"$tmp/docs_x$f"
      (0 until f).map { c =>
        if (c == 0) base
        else base.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper + digits,
            perm(lower, 3 * c + 1) + perm(upper, 3 * c + 2) +
              perm(digits, 3 * c + 3)).as("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
      val input = spark.read.parquet(p).filter(length(col("text")) >= 5)
      val n = input.count()

      // the d4b cand-phase prefix relation, verbatim shape
      val tok = input.select(col("doc_id").as("__id"),
          array_sort(charShingles(col("text"), 5)).as("__sh"))
        .select(col("__id"), size(col("__sh")).as("__na"),
          explode(col("__sh")).as("__s"))
      val dfreq = tok.groupBy("__s").agg(count(lit(1)).as("__df"))
      val prefix = tok.join(dfreq, Seq("__s"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__id").orderBy(col("__df"), col("__s"))))
        .filter(col("__rn") <= col("__na") - ceil(lit(t0v) * col("__na") - lit(1e-9)) + 1)
        .select(col("__s"), col("__df"),
          (col("__rn") <= col("__na") -
            ceil(lit(2 * t0v / (1 + t0v)) * col("__na") - lit(1e-9)) + 1).as("__ix"))

      // per-gram prefix-occupancy counts and the join upper bound,
      // split by space class (boundary grams: >= 2 spaces)
      val perGram = prefix.groupBy("__s")
        .agg(first("__df").as("df"),
          sum(when(col("__ix"), 1L).otherwise(0L)).as("nIx"),
          count(lit(1)).as("nStd"))
        .withColumn("cls",
          when(size(split(col("__s"), " ", -1)) - 1 >= 2, "s>=2")
            .otherwise("s<=1"))
      val rows = perGram.groupBy("cls")
        .agg(count(lit(1)).as("grams"),
          max("df").as("maxDf"), sum("df").as("sumDf"),
          sum(col("nIx") * col("nStd")).as("candUB"))
        .orderBy("cls").collect()
      println(s"== factor x$f: $n docs ==")
      println("cls,grams,maxDf,sumDf,candUB")
      rows.foreach(r => println(
        s"${r.getString(0)},${r.getLong(1)},${r.getLong(2)},${r.getLong(3)},${r.getLong(4)}"))
    }
    spark.stop()
  }
}
