package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed FASTA reader (reference: BioSeqPipe,
  * fireworks/toolbox/pipes.py:18-68 — one row per record with columns
  * `sequences, ids, names, descriptions, dbxrefs`).
  *
  * Record splitting uses the text source's custom `lineSep` ("\n>"),
  * so the input format handles record boundaries across file splits —
  * no whole-file reads, scales to arbitrarily large FASTA. The
  * reference's `reset()` re-open semantics are subsumed by Spark
  * sources being re-scannable.
  */
object FastaSource {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", "\n>").text(path)
    raw
      .filter(length(trim(col("value"))) > 0)
      // the first record keeps its leading '>'
      .withColumn("rec", regexp_replace(col("value"), "^>", ""))
      .withColumn("header", substring_index(col("rec"), "\n", 1))
      .select(
        regexp_replace(
          expr("substring(rec, length(header) + 2)"), "\n", "").as("sequences"),
        split(col("header"), " ").getItem(0).as("ids"),
        split(col("header"), " ").getItem(0).as("names"),
        col("header").as("descriptions"),
        array().cast("array<string>").as("dbxrefs"))
  }
}
