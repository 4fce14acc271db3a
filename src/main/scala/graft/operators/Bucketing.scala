package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange — the
  * canonical 100 TB co-located-join strategy (both fact tables
  * bucketed by the join key → join is a zip of bucket pairs).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, tableName: String,
                    bucketCol: String, buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(tableName)

  /** Join two tables bucketed on the same key with the same bucket
    * count — planner elides both shuffles. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
