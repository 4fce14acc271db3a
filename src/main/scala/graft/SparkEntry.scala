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
      (qp.CurationQueries.queries, qp.CurationQueries.oracles),
      (qp.StreamQueries.queries, qp.StreamQueries.oracles),
      (qp.ModelQueries.queries, qp.ModelQueries.oracles),
      (qp.DbQueries.queries, qp.DbQueries.oracles),
      (qp.ExtraQueries.queries, qp.ExtraQueries.oracles)
    )

  /** Flagship (SURVEY §7.3 minimum end-to-end slice): lineitem →
    * Frame(_idx) → train/test split → deterministic shuffle →
    * minibatches → Normalizer fit+transform → per-batch summary.
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val f = graft.frame.Frame.fromDF(
      Tables.lineitem(spark, d).select("l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_orderkey", "l_linenumber", "l_quantity"))
    val (train, _) = graft.prep.Preprocessing.splitByMod(f, "l_orderkey", 5, 0)
    val shuffled = graft.operators.Pipes.shuffleByHash(
      train, Seq("l_orderkey", "l_linenumber", "l_quantity"))
    val n = shuffled.length
    val batched = graft.operators.Pipes.withBatches(shuffled, 25L, n)
    val normalized = graft.prep.Normalizer.fitTransform(batched.df, Seq("l_quantity"))
    normalized.groupBy("batch_id")
      .agg(count(lit(1)).as("n"),
        round(avg("l_quantity"), 6).as("mean_norm_qty"))
      .orderBy("batch_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)

  /** Release every memoized/persisted intermediate the query packs hold
    * (call at the end of a Verify/Bench run — long-lived sessions would
    * otherwise accumulate cached blocks across scale dirs). */
  def releaseCaches(): Unit = {
    qp.FrameQueries.releaseCaches()
    qp.PipeQueries.releaseCaches()
    qp.DedupQueries.releaseCaches()
    qp.ModelQueries.releaseCaches()
    qp.TextAnalysisQueries.releaseCaches()
    graft.functions.SearchFunctions.releaseCaches()
  }
}
