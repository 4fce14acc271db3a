package graft.db

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JDBC table I/O (reference: TablePipe/DBPipe,
  * fireworks/extensions/database.py:11-282). The reference wraps
  * SQLAlchemy over sqlite; here the same surface wraps Spark's JDBC
  * source over any JDBC database (embedded Derby in tests — it ships
  * with Spark). Reads go through `spark.read.jdbc`, so predicate
  * pushdown and column pruning happen server-side exactly like the
  * reference's `DBPipe.filter` / `query(entities)` (database.py:84-112,
  * 255-263); at cluster scale reads parallelize via partitionColumn.
  */
final class JdbcTable(spark: SparkSession, url: String, table: String) {

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** S5 create_table (database.py:164-192): DDL from a StructType. */
  def create(schema: StructType): Unit = {
    val cols = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType      => "BIGINT"
        case IntegerType   => "INTEGER"
        case DoubleType    => "DOUBLE"
        case FloatType     => "REAL"
        case StringType    => "VARCHAR(4096)"
        case TimestampType => "TIMESTAMP"
        case BooleanType   => "BOOLEAN"
        case other         => sys.error(s"unsupported JDBC type: $other")
      }
      s""""${f.name}" $t"""
    }.mkString(", ")
    withConn(_.createStatement().execute(s"""CREATE TABLE "$table" ($cols)"""))
  }

  /** Drop the table if it exists (Derby has no IF EXISTS — the
    * does-not-exist SQLState 42Y55 is swallowed, anything else
    * propagates). Lets repeated round-trips reuse ONE database
    * instead of booting a fresh Derby per invocation. */
  def drop(): Unit = withConn { c =>
    try c.createStatement().execute(s"""DROP TABLE "$table"""")
    catch {
      case e: java.sql.SQLException if e.getSQLState == "42Y55" => ()
    }
  }

  /** S3 insert (database.py:53-82): bulk append. */
  def insert(df: DataFrame): Unit =
    df.write.mode("append").jdbc(url, s""""$table"""", new java.util.Properties)

  /** S3 query / S4 DBPipe (database.py:84-112): a lazy DataFrame over
    * the table — compose .select/.filter and Spark pushes both down. */
  def query(): DataFrame = spark.read.jdbc(url, s""""$table"""", new java.util.Properties)

  /** S4 len(DBPipe) = COUNT pushed to the database (database.py:251-253). */
  def count(): Long = withConn { c =>
    val rs = c.createStatement().executeQuery(s"""SELECT COUNT(*) FROM "$table"""")
    rs.next(); rs.getLong(1)
  }

  /** S3 delete(col, values) (database.py:114-116). An empty values
    * list deletes nothing (the reference's semantics) instead of
    * issuing the malformed SQL `IN ()`. */
  def delete(column: String, values: Seq[Any]): Int =
    if (values.isEmpty) 0
    else withConn { c =>
      val ph = values.map(_ => "?").mkString(", ")
      val st = c.prepareStatement(s"""DELETE FROM "$table" WHERE "$column" IN ($ph)""")
      try {
        values.zipWithIndex.foreach { case (v, i) => st.setObject(i + 1, v) }
        st.executeUpdate()
      } finally st.close()
    }

  /** S3 update(filter_col, batch) (database.py:118-120): for each batch
    * row, set the listed columns where filterCol matches. Rows are
    * grouped by column shape and each shape compiles ONE prepared
    * statement driven with executeBatch — not a new (never-closed)
    * statement per row, which grows Derby's open-statement set and
    * recompiles the same SQL O(batch) times. */
  def update(filterCol: String, batch: Seq[Map[String, Any]]): Unit = withConn { c =>
    batch.groupBy(_.keys.filterNot(_ == filterCol).toSeq.sorted).foreach {
      case (sets, rows) =>
        val st = c.prepareStatement(
          s"""UPDATE "$table" SET ${sets.map(k => s""""$k" = ?""").mkString(", ")}
             | WHERE "$filterCol" = ?""".stripMargin)
        try {
          rows.foreach { row =>
            sets.zipWithIndex.foreach { case (k, i) => st.setObject(i + 1, row(k)) }
            st.setObject(sets.size + 1, row(filterCol))
            st.addBatch()
          }
          st.executeBatch()
        } finally st.close()
    }
  }

  /** S3 upsert (database.py:122-130 — a stub in the reference; real
    * here): MERGE on a key column. */
  def upsert(keyCol: String, batch: Seq[Map[String, Any]]): Unit = withConn { c =>
    batch.groupBy(_.keys.toSeq.sorted).foreach { case (cols, rows) =>
      val nonKey = cols.filterNot(_ == keyCol)
      val st = c.prepareStatement(
        s"""MERGE INTO "$table" t
           | USING SYSIBM.SYSDUMMY1
           | ON t."$keyCol" = ?
           | WHEN MATCHED THEN UPDATE SET ${nonKey.map(k => s""""$k" = ?""").mkString(", ")}
           | WHEN NOT MATCHED THEN INSERT (${cols.map(k => s""""$k"""").mkString(", ")})
           |   VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin)
      try {
        rows.foreach { row =>
          var i = 1
          st.setObject(i, row(keyCol)); i += 1
          nonKey.foreach { k => st.setObject(i, row(k)); i += 1 }
          cols.foreach { k => st.setObject(i, row(k)); i += 1 }
          st.addBatch()
        }
        st.executeBatch()
      } finally st.close()
    }
  }

  /** S5 reflect_table (database.py:364-377): schema from the live DB. */
  def reflectSchema(): StructType = query().schema
}

object JdbcTable {
  /** Embedded Derby database under `dir` (created on first connect). */
  def derbyUrl(dir: String): String = s"jdbc:derby:$dir;create=true"
}
