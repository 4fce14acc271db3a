package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal repro: when does Spark reuse one BroadcastExchange for two
  * attaches of the same cached relation under AQE? */
object ReuseRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = (1L to 1000L).map(i => (i, Array.fill(4)(i))).toDF("__id", "__hs")
      .persist()
    base.count()
    val pre = (1L to 500L).map(i => (i, i + 1)).toDF("a", "b")

    def audit(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect() // executes THIS queryExecution so the adaptive plan finalizes
      val plan = df.queryExecution.executedPlan.toString
      val nB = "BroadcastExchange".r.findAllIn(plan).size
      val nR = "(ReusedExchange|reuses)".r.findAllIn(plan).size
      val nQ = "BroadcastQueryStage".r.findAllIn(plan).size
      val stageIds = "BroadcastQueryStage \\d+".r.findAllIn(plan).toList
      println(s"$name: BroadcastExchange=$nB Reused=$nR stages=$stageIds")
    }

    // shape 1: alias-qualified joins on the same DataFrame object
    audit("alias-joins") {
      broadcast(base).as("x")
      pre.join(broadcast(base).as("x"), col("a") === col("x.__id"))
        .select(col("a"), col("b"), col("x.__hs").as("__sha"))
        .join(broadcast(base).as("y"), col("b") === col("y.__id"))
        .select(col("a"), col("b"), col("__sha"), col("y.__hs").as("__shb"))
    }

    // shape 2: renamed projections (round-9 form)
    audit("renamed-projs") {
      pre.join(broadcast(base.select(col("__id").as("a"), col("__hs").as("__sha"))), Seq("a"))
        .join(broadcast(base.select(col("__id").as("b"), col("__hs").as("__shb"))), Seq("b"))
    }

    // shape 4: build side is an UNPERSISTED projection over the cached
    // parent — does AQE stage reuse fire without InMemoryTableScan at
    // the exchange root?
    val proj = base.select(col("__id"), transform(col("__hs"), x => x + 1L).as("__hs"))
    audit("unpersisted-proj") {
      pre.join(broadcast(proj).as("x"), col("a") === col("x.__id"))
        .select(col("a"), col("b"), col("x.__hs").as("__sha"))
        .join(broadcast(proj).as("y"), col("b") === col("y.__id"))
        .select(col("a"), col("b"), col("__sha"), col("y.__hs").as("__shb"))
    }

    // shape 3: same as 1 but AQE off for this query
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    audit("alias-joins-noAQE") {
      pre.join(broadcast(base).as("x"), col("a") === col("x.__id"))
        .select(col("a"), col("b"), col("x.__hs").as("__sha"))
        .join(broadcast(base).as("y"), col("b") === col("y.__id"))
        .select(col("a"), col("b"), col("__sha"), col("y.__hs").as("__shb"))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
