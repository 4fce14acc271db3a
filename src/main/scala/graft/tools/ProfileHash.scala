package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.DedupFunctions._

/** Hash-family profiler for the sketch kernels: measures the MinHash
  * signature stage and the SimHash fingerprint stage under the "md5"
  * (oracle-reproducible, default) and "xxh64" (production) families —
  * at 100 TB the signature pass is the floor of the dedup pipelines, so
  * the family knob is the remaining lever once the LSH plan shape is
  * right. Not part of the driver contract; run with
  * `sbt "runMain graft.tools.ProfileHash /root/testdata/sf0.1"`. */
object ProfileHash {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def median3[T](f: => T): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }

    val docs = documents(spark, d)
    docs.count() // warm page cache + codegen
    val withSh = docs.select(col("doc_id").as("__id"),
      wordShingles(col("text"), 3).as("__sh"))
    // every stage is drained through an aggregate that CONSUMES the
    // computed column — a bare count() lets Catalyst prune the
    // signature projection and measures nothing
    val shingleFloor = median3(
      withSh.agg(sum(size(col("__sh")))).collect())
    println(f"shingles only (floor)        $shingleFloor%8.2f s")
    for (fam <- Seq("md5", "xxh64")) {
      val sigT = median3 {
        withSh.select(col("__id"),
          graft.expressions.HashExpressions.minhash_signature(
            col("__sh"), 64, fam).as("__sig"))
          .agg(sum(element_at(col("__sig"), 1))).collect()
      }
      val simT = median3 {
        docs.select(graft.expressions.HashExpressions.simhash32_native(
          split(col("text"), " "), fam).as("__h"))
          .agg(sum(col("__h"))).collect()
      }
      println(f"minhash64 signature [$fam%-5s]  ${sigT}%8.2f s (hash stage ${sigT - shingleFloor}%5.2f s)")
      println(f"simhash32 fingerprint [$fam%-5s]${simT}%8.2f s")
    }
    val e2e = for (fam <- Seq("md5", "xxh64")) yield {
      val t = median3 {
        val p = minhashNearDuplicates(docs, "doc_id", "text", 3, 64, 16, 0.8, fam)
        p.count(); p.unpersist(blocking = false)
      }
      println(f"d2 end-to-end [$fam%-5s]        $t%8.2f s")
      t
    }
    println(f"d2 xxh64/md5 ratio: ${e2e(1) / e2e(0)}%.2f")
    spark.stop()
  }
}
