package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.db.JdbcTable

/** JDBC table-surface round-trip (S3/S4/S5): create → bulk insert →
  * delete → filtered pushdown read, against embedded Derby. The final
  * table contents are a pure function of `customer`, so the oracle
  * recomputes them relationally.
  */
object DbQueries {

  /** One embedded Derby database per JVM, deleted at exit: bench
    * passes re-invoke the builder many times, and a fresh
    * createTempDirectory + Derby boot per invocation leaked disk AND
    * driver heap (embedded Derby keeps every booted database's page
    * cache live until a shutdown that never came). The round-trip
    * drops and recreates its table instead. */
  private lazy val dbDir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_dbq")
    sys.addShutdownHook {
      // shut the engine down BEFORE walking the directory: embedded
      // Derby writes lock/log files at exit and shutdown-hook ordering
      // is unspecified, so deleting a live database races its own
      // exit-time writes. Engine shutdown always "fails" with XJ015 —
      // that SQLException IS the success signal.
      try java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true")
      catch { case _: java.sql.SQLException => () }
      import java.nio.file.{Files, Path}
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
    p.toString + "/db"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s3_table_roundtrip" -> ((s, d) => {
      val t = new JdbcTable(s, JdbcTable.derbyUrl(dbDir), "cust")
      t.drop()
      t.create(StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType))))
      t.insert(customer(s, d)
        .filter(col("c_custkey") <= 500)
        .select("c_custkey", "c_name", "c_acctbal"))
      t.delete("c_custkey", (0L to 500L by 7L))
      t.query()
        .filter(col("c_acctbal") > 1000.0)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "s3_table_roundtrip" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey <= 500 AND c_custkey % 7 <> 0 AND c_acctbal > 1000.0
        |ORDER BY c_custkey""".stripMargin
  )
}
