package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (100 TB design: a handful of hot keys
  * must not serialize into one reducer).
  *
  * Results are bit-identical to the unsalted plans (the oracle checks
  * this) — only the shuffle layout changes.
  */
object Skew {

  /** Deterministic salt in [0, salts) from arbitrary columns — derived
    * from xxhash64 of the row's identity, so re-runs and retries place
    * rows identically (no RNG state in the shuffle). */
  def salt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Two-phase salted aggregation: partial aggregate on (key, salt) —
    * spreading a hot key over `salts` reducers — then final aggregate
    * on key. Valid for algebraic aggregates (sum/count/min/max);
    * decimal sums keep it exact. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int, saltBy: Seq[String]): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(salts, saltBy.map(col): _*))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Skewed equi-join: the big side keeps its salt, the small side is
    * replicated once per salt value — a hot join key fans out over
    * `salts` tasks instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val b = big.withColumn("__salt", salt(salts, big.columns.map(col).toSeq: _*))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}

