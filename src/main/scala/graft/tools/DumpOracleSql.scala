package graft.tools

/** Debug harness: dump a query pack's generated oracle SQL to /tmp
  * for standalone DuckDB iteration (`python3 -c "import duckdb; ..."`)
  * — the generated replay oracles (t8 BPE, t9 unigram) are hundreds of
  * CTE lines, and iterating on them through a full Verify cycle costs
  * minutes per attempt. Usage:
  *   sbt "runMain graft.tools.DumpOracleSql t9_unigram_vocab ..."
  */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val all = graft.SparkEntry.oracleSql
    args.foreach { n =>
      val p = java.nio.file.Paths.get(s"/tmp/oracle_$n.sql")
      java.nio.file.Files.write(p,
        all(n).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $p (${all(n).length} chars)")
    }
  }
}
