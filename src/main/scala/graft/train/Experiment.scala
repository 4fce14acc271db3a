package graft.train

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** S8 Experiment store (reference: extensions/experiment.py:35-163):
  * a per-experiment directory holding saved tables plus a metadata
  * table (name, iteration, description, timestamp). The reference's
  * sqlite engines become parquet tables in the experiment directory —
  * schema travels with the data, readable by any engine.
  */
final class Experiment(val name: String, baseDir: String, spark: SparkSession) {
  import spark.implicits._

  val dir: String = {
    // reference uniquifies as name_0, name_1, ... (experiment.py:55-61).
    // createDirectory (singular) makes claiming a suffix ATOMIC: two
    // concurrent drivers racing the same name get distinct dirs instead
    // of both "creating" one via the idempotent createDirectories and
    // silently clobbering each other's tables.
    Files.createDirectories(Paths.get(baseDir))
    var i = 0
    var claimed: Option[java.nio.file.Path] = None
    while (claimed.isEmpty) {
      val d = Paths.get(baseDir, s"${name}_$i")
      try { Files.createDirectory(d); claimed = Some(d) }
      catch { case _: java.nio.file.FileAlreadyExistsException => i += 1 }
    }
    claimed.get.toString
  }

  private def metaPath = s"$dir/_metadata"

  def logMetadata(iteration: Long, description: String, timestampMs: Long): Unit =
    Seq((name, iteration, description, new java.sql.Timestamp(timestampMs)))
      .toDF("name", "iteration", "description", "timestamp")
      .write.mode("append").parquet(metaPath)

  def metadata: DataFrame = spark.read.parquet(metaPath)

  def saveTable(tableName: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$tableName")

  def loadTable(tableName: String): DataFrame =
    spark.read.parquet(s"$dir/$tableName")
}
