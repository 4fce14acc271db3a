package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.DedupFunctions._

/** Round-7 stage profile for the containment scale path (x11b): where
  * do the seconds go at sf0.1 — ranking, candidate join, or verify? */
object ProfileX11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("profile-x11").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    val big = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
      .persist(); big.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    for (rep <- 1 to 2) {
      println(s"-- rep $rep --")
      val t = 0.7
      val sh = big.select(col("doc_id").as("__id"),
          wordShingles(col("text"), 3).as("__sh")).persist()
      time("shingles")(sh.count())
      val tok = sh.select(col("__id"), size(col("__sh")).as("__na"),
        explode(col("__sh")).as("__s"))
      val dfreq = tok.groupBy("__s").agg(count(lit(1)).as("__df"))
      val ranked = tok.join(dfreq, Seq("__s"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__id").orderBy(col("__df"), col("__s"))))
        .select(col("__id"), xxhash64(col("__s")).as("__sk"), col("__s"),
          col("__rn"), col("__na"))
        .persist()
      time("rank (dfreq+window)")(ranked.count())
      val prefix = ranked
        .filter(col("__rn") <= col("__na") - ceil(lit(t) * col("__na") - lit(1e-9)) + 1)
        .toDF("__pa", "__sk", "__sa", "__ra", "__naa")
      val joined = prefix
        .join(ranked.toDF("__pb", "__sk", "__sb", "__rb", "__nab"), Seq("__sk"))
        .filter(col("__sa") === col("__sb")).filter(col("__pa") =!= col("__pb"))
      val nJoin = time("raw candidate join")(joined.count())
      val cand = joined
        .filter(lit(1) + least(col("__naa") - col("__ra"), col("__nab") - col("__rb")) >=
          ceil(lit(t) * col("__naa") - lit(1e-9)) - ceil(lit(0.05) * col("__naa")))
        .groupBy("__pa", "__pb", "__naa", "__nab")
        .agg(count(lit(1)).as("__cnt"), max("__ra").as("__mra"), max("__rb").as("__mrb"))
        .filter(col("__cnt") +
            least(col("__naa") - col("__mra"), col("__nab") - col("__mrb")) >=
          ceil(lit(t) * col("__naa") - lit(1e-9)))
        .select(col("__pa").as("a"), col("__pb").as("b"))
        .persist()
      val nCand = time("positional+group bound")(cand.count())
      val hsh = sh.select(col("__id"),
          array_sort(array_distinct(transform(col("__sh"),
            s => conv(md5(s).substr(lit(1), lit(10)), 16, 10).cast("long")))).as("__hs"))
        .persist()
      time("hash sets")(hsh.count())
      val verified = cand
        .join(hsh.select(col("__id").as("a"), col("__hs").as("__sha")), Seq("a"))
        .join(hsh.select(col("__id").as("b"), col("__hs").as("__shb")), Seq("b"))
        .withColumn("containment",
          round(graft.expressions.HashExpressions.sorted_long_intersect_count(
              col("__sha"), col("__shb")).cast("double") /
            size(col("__sha")).cast("double"), 6))
        .filter(col("containment") >= t)
      val nVer = time("verify join")(verified.count())
      println(s"rows: join=$nJoin cand=$nCand verified=$nVer")
      sh.unpersist(); ranked.unpersist(); cand.unpersist(); hsh.unpersist()
    }
    spark.stop()
  }
}
