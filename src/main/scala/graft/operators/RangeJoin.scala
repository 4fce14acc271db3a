package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable range join: `left ⋈ right ON key ∧ right.ts ∈
  * [left.ts - before, left.ts + after]`.
  *
  * A naive theta-join on the range condition degenerates to a
  * nested-loop per key. This implementation bucketizes time into bins
  * of `binWidth` seconds and equi-joins on (key, bin), fanning the
  * left side out over ceil((before+after)/binWidth)+1 bins, then
  * applies the exact range filter — shuffle ∝ inputs × small fan-out,
  * never |left|×|right| per key.
  */
object RangeJoin {

  def byBucket(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               beforeSec: Long, afterSec: Long, binWidthSec: Long): DataFrame = {
    require(binWidthSec > 0)
    val fanLo = -Math.floorDiv(beforeSec + binWidthSec - 1, binWidthSec)
    val fanHi = Math.floorDiv(afterSec + binWidthSec - 1, binWidthSec)
    // exact integral division (a double division could flip floor at
    // bin boundaries for large microsecond values)
    def bin(ts: Column): Column =
      (unix_micros(ts) - pmod(unix_micros(ts), lit(binWidthSec * 1000000L))) /
        lit(binWidthSec * 1000000L) cast "long"
    val l = left.withColumn("__bin",
      explode(sequence(bin(col(leftTs)) + fanLo, bin(col(leftTs)) + fanHi)))
    val r = right.withColumn("__bin", bin(col(rightTs)))
    l.join(r, keyCols :+ "__bin")
      .filter(unix_micros(col(rightTs)) >= unix_micros(col(leftTs)) - lit(beforeSec * 1000000L) &&
        unix_micros(col(rightTs)) <= unix_micros(col(leftTs)) + lit(afterSec * 1000000L))
      .drop("__bin")
  }
}
