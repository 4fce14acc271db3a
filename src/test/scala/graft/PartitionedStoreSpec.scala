package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PartitionedStore

/** The shared one-partition-column store machinery's READ side:
  * [[PartitionedStore.prunedRead]] must be a pure optimization — same
  * rows, same schema, same partition column as the full-tree
  * read + isin filter it replaces (discovery O(probed) is the point;
  * semantics must not move). */
class PartitionedStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def store(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pstore").toString
    (0L until 200L).map(i => (i, i % 8, s"v$i")).toDF("id", "cell", "payload")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    dir
  }

  test("prunedRead equals full-read + isin on present, absent, and mixed value sets") {
    val dir = store()
    def full(vals: Seq[Any]) =
      spark.read.parquet(dir).filter(col("cell").isin(vals: _*))
        .select("id", "payload", "cell")
    def pruned(vals: Seq[Any]) =
      PartitionedStore.prunedRead(spark, dir, "cell", vals)
        .select("id", "payload", "cell")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val present = Seq[Any](1L, 5L)
    assert(rows(pruned(present)) == rows(full(present)))
    assert(rows(pruned(present)).nonEmpty)

    // values with no directory are skipped, not an error
    val mixed = Seq[Any](2L, 99L)
    assert(rows(pruned(mixed)) == rows(full(mixed)))

    // a fully-absent set yields an EMPTY frame with the intact schema
    val absent = Seq[Any](404L)
    val e = pruned(absent)
    assert(e.count() == 0)
    assert(e.schema.fieldNames.toSet == Set("id", "payload", "cell"))

    // the partition column survives the basePath read with its value
    val cells = PartitionedStore.prunedRead(spark, dir, "cell", Seq[Any](3L))
      .select(col("cell").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(cells == Set(3L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("prunedRead keeps the static partition filter in the executed plan") {
    // few values render as IN, many as INSET (OptimizeIn threshold) —
    // both are static PartitionFilters on the partition column, which
    // is the shape PlanSpec pins for the real ANN probe
    val dir = store()
    def planOf(vals: Seq[Any]) =
      PartitionedStore.prunedRead(spark, dir, "cell", vals)
        .queryExecution.executedPlan.toString
    val few = planOf(Seq[Any](1L, 5L))
    assert(few.contains("PartitionFilters") &&
      few.matches("(?s).*PartitionFilters[^\\]]*cell[^\\]]*IN.*"),
      s"pruned read must carry the static partition filter:\n$few")
    val many = planOf((0L until 12L).map(identity[Any]))
    assert(many.contains("PartitionFilters") && many.contains("INSET"),
      s"a wide value set must still plan as INSET PartitionFilters:\n$many")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
