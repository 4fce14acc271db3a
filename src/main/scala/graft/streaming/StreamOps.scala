package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time windowing and temporal joins (SURVEY §2.11 parity-plus).
  *
  * Each combinator is plan-shape-identical in batch and Structured
  * Streaming: the same `window`/`session_window` expressions run over
  * `read` or `readStream` inputs (StreamingSpec drives the streaming
  * path with watermarks; the oracle gate drives the batch path).
  */
object StreamOps {

  /** Tumbling event-time window aggregation. */
  def tumbling(df: DataFrame, tsCol: String, duration: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(col(tsCol), duration) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding event-time window aggregation. */
  def sliding(df: DataFrame, tsCol: String, duration: String, slide: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(col(tsCol), duration, slide) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows: events within `gap` of each other merge; a gap
    * >= `gap` closes the session. */
  def sessions(df: DataFrame, tsCol: String, gap: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** As-of join: for each left row, the latest right row with
    * right.ts <= left.ts on the same key.
    *
    * Implemented as union + running `last(_, ignoreNulls)` over a
    * (key, ts) window — O(n log n) per key partition, no range-join
    * explosion, shuffle ∝ |left| + |right| on the key. Right rows sort
    * before left rows at equal timestamps (inclusive as-of).
    *
    * `rightCols` must not collide with left columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    val lStruct = left.select(leftCols.map(col): _*).schema
    val rStruct = right.select(rightCols.map(col): _*).schema
    val lTagged = left.select(
      keyCols.map(col) ++
        Seq(col(tsCol).as("__ts"), lit(1).as("__isl"),
          struct(leftCols.map(col): _*).as("__l"),
          lit(null).cast(rStruct).as("__r")): _*)
    val rTagged = right.select(
      keyCols.map(col) ++
        Seq(col(tsCol).as("__ts"), lit(0).as("__isl"),
          lit(null).cast(lStruct).as("__l"),
          struct(rightCols.map(col): _*).as("__r")): _*)
    val combined = lTagged.unionByName(rTagged)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__isl").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isl") === 1)
      .select(keyCols.map(col) ++ Seq(col("__ts").as(tsCol)) ++
        leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
