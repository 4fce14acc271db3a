package graft.operators

import org.apache.spark.sql.functions._
import graft.frame.Frame

/** Multi-input operators (reference: fireworks/toolbox/junctions.py).
  * A Junction holds N named inputs; here each combinator takes N Frames
  * and yields one. Required-component validation (junction.py:17-99)
  * becomes ordinary arity/schema checks.
  */
object Junctions {

  /** J1 HubJunction (junctions.py:14-64): merge N inputs into one
    * stream until all are exhausted — order across inputs is not
    * specified by the reference, so this is a plain union with inputs
    * concatenated (input i after all of input i-1). */
  def hub(frames: Seq[Frame]): Frame =
    frames.reduceLeft(_ append _)

  /** J3 ClockworkHubJunction (junctions.py:75-96): strict round-robin
    * interleave — row r of the result is row (r / n) of input (r % n)
    * while inputs last; ragged tails continue round-robin among the
    * surviving inputs. Implemented as a distributed re-rank on the
    * (round, source) key — no driver-side loop. */
  def roundRobin(frames: Seq[Frame]): Frame = {
    require(frames.nonEmpty)
    val tagged = frames.zipWithIndex.map { case (f, i) =>
      f.df.withColumn("__src", lit(i))
    }
    val all = tagged.reduceLeft(_ unionByName _)
      .withColumnRenamed(Frame.IDX, "__round")
    Frame.fromDF(all, Seq("__round", "__src")).dropCols("__round", "__src")
  }

  /** J2 RandomHubJunction (junctions.py:66-73): union + seeded shuffle. */
  def randomHub(frames: Seq[Frame], seed: Long): Frame =
    Pipes.shuffle(hub(frames), seed)

  /** J4 SwitchJunction (junctions.py:98-128): route to one selected
    * component — plan-time selection. */
  def switch(frames: Map[String, Frame], selected: String): Frame =
    frames(selected)

  /** J5 parity-plus set ops (absent in the reference, free in Spark):
    * positional content intersect/except over the data columns. */
  def intersectData(a: Frame, b: Frame): Frame = {
    val cols = a.columns
    Frame.fromDF(
      a.df.select(cols.map(col): _*).intersect(b.df.select(cols.map(col): _*)),
      cols)
  }
  def exceptData(a: Frame, b: Frame): Frame = {
    val cols = a.columns
    Frame.fromDF(
      a.df.select(cols.map(col): _*).except(b.df.select(cols.map(col): _*)),
      cols)
  }
}
