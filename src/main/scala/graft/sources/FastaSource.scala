package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed sequence-file reader (reference: BioSeqPipe,
  * fireworks/toolbox/pipes.py:18-68 — one row per record with columns
  * `sequences, ids, names, descriptions, dbxrefs`; the reference's
  * `filetype` arg accepts any Biopython SeqIO format string,
  * pipes.py:33-47). This port carries the three formats with tests:
  * FASTA, FASTQ (FASTQ rows add a `qualities` column), and SeqIO's
  * two-column `tab` format (one `id<TAB>sequence` record per line —
  * line-splittable, so it distributes like any text source).
  *
  * FASTA record splitting uses the text source's custom `lineSep`
  * ("\n>"), so the input format handles record boundaries across file
  * splits — no whole-file reads, scales to arbitrarily large FASTA.
  * The reference's `reset()` re-open semantics are subsumed by Spark
  * sources being re-scannable.
  *
  * FASTQ can NOT use the lineSep trick: '@' (ASCII 64) is a legal
  * Phred+33 quality character, so a quality line may begin with '@'
  * and a "\n@" split would shear records. Valid FASTQ is exactly
  * 4 lines per record, so records are recovered positionally: a
  * distributed line index (zipWithIndex — one extra count job, the
  * Frame `_idx` discipline) groups lines 4-at-a-time. Malformed input
  * (line count not a multiple of 4, missing '@' header or '+'
  * separator) fails the read loudly via an in-plan assertion rather
  * than silently shearing records. */
object FastaSource {

  def read(spark: SparkSession, path: String,
           filetype: String = "fasta"): DataFrame =
    filetype.toLowerCase match {
      case "fasta" => readFasta(spark, path)
      case "fastq" => readFastq(spark, path)
      case "tab" => readTab(spark, path)
      case "genbank" | "gb" => readGenBank(spark, path)
      case other => throw new IllegalArgumentException(
        s"unsupported filetype '$other' (supported: fasta, fastq, tab, genbank)")
    }

  private def readFasta(spark: SparkSession, path: String): DataFrame = {
    // explicit lineSep disables the text source's CRLF normalization,
    // so strip \r in-plan or Windows files silently embed it in
    // sequences and leave it trailing on ids (downstream joins miss)
    val raw = spark.read.option("lineSep", "\n>").text(path)
      .withColumn("value", regexp_replace(col("value"), "\r", ""))
    raw
      .filter(length(trim(col("value"))) > 0)
      // the first record keeps its leading '>'
      .withColumn("rec", regexp_replace(col("value"), "^>", ""))
      .withColumn("header", substring_index(col("rec"), "\n", 1))
      .select(
        regexp_replace(
          expr("substring(rec, length(header) + 2)"), "\n", "").as("sequences"),
        split(col("header"), " ").getItem(0).as("ids"),
        split(col("header"), " ").getItem(0).as("names"),
        col("header").as("descriptions"),
        array().cast("array<string>").as("dbxrefs"))
  }

  /** SeqIO's `tab` format: `id<TAB>sequence`, one record per line.
    * Like Biopython, the id doubles as name and description (a tab
    * record has no separate description field), and a line without a
    * tab is malformed — rejected in-plan, same loud-failure discipline
    * as readFastq. Blank lines are skipped (SeqIO tolerates them at
    * end-of-file). */
  private def readTab(spark: SparkSession, path: String): DataFrame = {
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .filter(assert_true(col("value").contains("\t"),
        concat(lit("malformed tab record (no tab separator): '"),
          col("value"), lit("'"))).isNull)
      .withColumn("__id", substring_index(col("value"), "\t", 1))
      .select(
        // everything after the FIRST tab (substring_index(…, -1) would
        // split at the last one if a malformed sequence embedded a tab)
        expr("substring(value, length(__id) + 2)").as("sequences"),
        col("__id").as("ids"),
        col("__id").as("names"),
        col("__id").as("descriptions"),
        array().cast("array<string>").as("dbxrefs"))
  }

  /** GenBank flat files (SeqIO filetype "genbank"/"gb",
    * pipes.py:33-47): records terminate with a `//` line, so the
    * record boundary distributes with `lineSep = "\n//"` like FASTA's
    * "\n>" — no whole-file reads. Field extraction follows Biopython's
    * SeqRecord mapping: `ids` = VERSION's accession.version (falling
    * back to ACCESSION, then LOCUS), `names` = the LOCUS name,
    * `descriptions` = the DEFINITION block with continuation lines
    * unwrapped, `dbxrefs` = the DBLINK entries as "Key:value", and
    * `sequences` = the ORIGIN block with position numbers and
    * whitespace stripped (original case kept, as SeqIO does). All
    * parsing is native regexp expressions — per-record, codegen'd, no
    * UDF. */
  private def readGenBank(spark: SparkSession, path: String): DataFrame = {
    // same CRLF normalization as readFasta (explicit lineSep)
    val raw = spark.read.option("lineSep", "\n//").text(path)
      .withColumn("value", regexp_replace(col("value"), "\r", ""))
    // a keyword block runs from its column-0 keyword to the next
    // column-0 non-space (keywords are upper-case at column 0;
    // continuations are indented)
    def block(kw: String) =
      regexp_extract(col("rec"), s"(?sm)^$kw\\s+(.*?)\\n(?=\\S)", 1)
    raw
      .filter(length(trim(col("value"))) > 0)
      // drop a leading newline a "\n//"-split leaves on non-first
      // records, then guarantee a trailing newline so the last block's
      // (?=\S) lookahead has an anchor even when ORIGIN is absent
      .select(concat(regexp_replace(col("value"), "^\\n", ""), lit("\n"))
        .as("rec"))
      .filter(col("rec").startsWith("LOCUS"))
      .withColumn("__locus", regexp_extract(col("rec"), "^LOCUS\\s+(\\S+)", 1))
      .withColumn("__acc",
        regexp_extract(col("rec"), "(?m)^ACCESSION\\s+(\\S+)", 1))
      .withColumn("__ver",
        regexp_extract(col("rec"), "(?m)^VERSION\\s+(\\S+)", 1))
      .withColumn("__def",
        regexp_replace(block("DEFINITION"), "\\n\\s+", " "))
      .withColumn("__dblink", block("DBLINK"))
      .withColumn("__origin",
        regexp_extract(col("rec"), "(?sm)^ORIGIN[^\\n]*\\n(.*)$", 1))
      .select(
        regexp_replace(col("__origin"), "[\\s0-9]+", "").as("sequences"),
        coalesce(nullif(col("__ver"), lit("")),
          nullif(col("__acc"), lit("")), col("__locus")).as("ids"),
        col("__locus").as("names"),
        col("__def").as("descriptions"),
        transform(
          regexp_extract_all(col("__dblink"), lit("(\\S+:\\s*\\S+)"), lit(1)),
          x => regexp_replace(x, ":\\s+", ":")).as("dbxrefs"))
  }

  private def readFastq(spark: SparkSession, path: String): DataFrame = {
    val session = spark
    import session.implicits._
    val byRecord = spark.read.text(path).rdd.zipWithIndex()
      .map { case (r, i) => (i / 4, (i % 4).toInt, r.getString(0)) }
      .toDF("__rec", "__pos", "value")
      .groupBy("__rec")
      .agg(
        count(lit(1)).as("__n"),
        max(when(col("__pos") === 0, col("value"))).as("__hdr"),
        max(when(col("__pos") === 1, col("value"))).as("sequences"),
        max(when(col("__pos") === 2, col("value"))).as("__plus"),
        max(when(col("__pos") === 3, col("value"))).as("qualities"))
    byRecord
      // fail loudly on malformed input instead of silently shearing
      // every record after the defect: each positional group must hold
      // all 4 lines (catches truncation / line count not a multiple of
      // 4) with the FASTQ sentinels in place ('@' header, '+'
      // separator — catches mid-file shear that preserves the line
      // count). assert_true sits in a filter so the optimizer can't
      // prune it; it returns null on success, so the filter keeps
      // every valid row and the first bad record fails the job.
      .filter(assert_true(
        col("__n") === 4 &&
          col("__hdr").startsWith("@") && col("__plus").startsWith("+"),
        concat(lit("malformed FASTQ: record "), col("__rec").cast("string"),
          lit(" (lines "), (col("__rec") * 4 + 1).cast("string"),
          lit("-"), (col("__rec") * 4 + 4).cast("string"),
          lit(") has "), col("__n").cast("string"),
          lit(" lines, header '"), coalesce(col("__hdr"), lit("<missing>")),
          lit("', separator '"), coalesce(col("__plus"), lit("<missing>")),
          lit("'"))).isNull)
      .filter(col("__hdr").isNotNull && length(trim(col("__hdr"))) > 0)
      .withColumn("header", regexp_replace(col("__hdr"), "^@", ""))
      .select(
        col("sequences"),
        split(col("header"), " ").getItem(0).as("ids"),
        split(col("header"), " ").getItem(0).as("names"),
        col("header").as("descriptions"),
        array().cast("array<string>").as("dbxrefs"),
        col("qualities"))
  }
}
