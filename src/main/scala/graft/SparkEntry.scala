package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => qp}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Aggregates the per-module query packs under `graft.queries`. Every
  * implemented operator from SURVEY §2 has a `queries` entry; SQL-
  * expressible ones also have a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (qp.CoreQueries.queries, qp.CoreQueries.oracles),
      (qp.FrameQueries.queries, qp.FrameQueries.oracles),
      (qp.PipeQueries.queries, qp.PipeQueries.oracles),
      (qp.TextQueries.queries, qp.TextQueries.oracles),
      (qp.DedupQueries.queries, qp.DedupQueries.oracles),
      (qp.SimilarityQueries.queries, qp.SimilarityQueries.oracles),
      (qp.TextAnalysisQueries.queries, qp.TextAnalysisQueries.oracles),
      (qp.StreamQueries.queries, qp.StreamQueries.oracles),
      (qp.ModelQueries.queries, qp.ModelQueries.oracles),
      (qp.DbQueries.queries, qp.DbQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qp.CoreQueries.queries("q1_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
