package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.FastaSource

/** FASTA source against the reference's own fixture
  * (/root/reference/test/sample_genes.fa: 759 protein records). */
class FastaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val fixture = "/root/reference/test/sample_genes.fa"

  test("parses all records with the BioSeqPipe schema") {
    val df = FastaSource.read(spark, fixture)
    assert(df.columns.toSet ==
      Set("sequences", "ids", "names", "descriptions", "dbxrefs"))
    assert(df.count() == 759)
    // every record has a non-empty id and sequence, no '>' leakage
    assert(df.filter(org.apache.spark.sql.functions.col("ids").startsWith(">")).count() == 0)
    // the fixture has exactly one sequence-less record (KK_AEA46692.1)
    assert(df.filter(org.apache.spark.sql.functions.length(
      org.apache.spark.sql.functions.col("sequences")) === 0).count() == 1)
  }

  test("source is re-scannable (reference reset() semantics)") {
    val df = FastaSource.read(spark, fixture)
    assert(df.count() == df.count())
  }
}
