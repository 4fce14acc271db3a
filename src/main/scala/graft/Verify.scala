package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A failed query must NEVER vanish silently: round 8 shipped 12 broken
    // queries as a shrunk-but-all-green artifact because failures only went
    // to stderr. Record every failure, dump them as an artifact, and exit
    // nonzero so the driver (and any human) sees red.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // SPARK_GRAFT_ONLY=a,b — builder-iteration subset (same contract as
    // Bench); the driver never sets it, so the gate always runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // releaseCaches/stop run in the finally: an exception between the
    // query loop and the artifact writes must not strand persisted
    // blocks or a live context for a follow-on session in this JVM
    try {
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-auditing summary: declared vs written counts plus the errors
    // map, so "artifact rows == SparkEntry.queries.size" is checkable
    // from the outDir alone. Under a SPARK_GRAFT_ONLY subset the counts
    // reflect the FILTERED list (a subset run must not claim every
    // query was written) and the active filter is recorded.
    val selected = SparkEntry.queries.keys
      .filter(n => only.forall(_.contains(n))).toSeq
    val declared = selected.size
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    val filterJson = only
      .map(f => s""", "only_filter": ${f.toSeq.sorted.map(q).mkString("[", ",", "]")}""")
      .getOrElse("")
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"),
      s"""{"declared": $declared, "written": ${declared - errors.size}, "failed": ${errors.size}, "errors": $errJson$filterJson}""")
    } finally {
      SparkEntry.releaseCaches()
      spark.stop()
    }
    if (errors.nonEmpty) {
      val ran = SparkEntry.queries.keys.count(n => only.forall(_.contains(n)))
      System.err.println(s"[verify] FAILED: ${errors.size}/$ran selected queries broke: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
