package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.db.JdbcTable

/** JDBC table surface over embedded Derby (mirrors the reference's
  * insert → query → filter → delete → update cycle,
  * database_test.py:79-228). */
class DbSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val url =
    JdbcTable.derbyUrl(java.nio.file.Files.createTempDirectory("graftdb").toString + "/db")

  test("create / insert / query / filter pushdown / delete / update / upsert / count") {
    val t = new JdbcTable(spark, url, "dummy")
    t.create(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("vals", IntegerType))))

    t.insert((0 until 20).map(i => (i.toLong, "johnny", i)).toDF("id", "name", "vals"))
    assert(t.count() == 20)

    // reference DBPipe.filter('between'): predicate composes into SQL
    val filtered = t.query().filter(col("vals").between(5, 9)).select("id", "vals")
    assert(filtered.count() == 5)

    assert(t.delete("vals", Seq(0, 1, 2)) == 3)
    assert(t.count() == 17)

    t.update("id", Seq(Map("id" -> 5L, "name" -> "updated")))
    assert(t.query().filter(col("name") === "updated").count() == 1)

    // upsert: one update, one insert (the reference left this a stub)
    t.upsert("id", Seq(
      Map("id" -> 6L, "name" -> "upserted", "vals" -> 60),
      Map("id" -> 999L, "name" -> "fresh", "vals" -> 1)))
    assert(t.count() == 18)
    assert(t.query().filter(col("name").isin("upserted", "fresh")).count() == 2)

    // reflect (reference reflect_table)
    assert(t.reflectSchema().fieldNames.map(_.toLowerCase).toSet == Set("id", "name", "vals"))
  }

  test("delete with an empty values list is a no-op, not malformed SQL") {
    val t = new JdbcTable(spark, url, "emptydel")
    t.create(StructType(Seq(StructField("id", LongType))))
    t.insert(Seq(1L, 2L, 3L).toDF("id"))
    assert(t.delete("id", Seq.empty) == 0)
    assert(t.count() == 3)
  }
}
