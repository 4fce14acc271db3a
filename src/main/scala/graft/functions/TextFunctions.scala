package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.frame.Frame

/** Text operators (reference: fireworks/toolbox/text.py + utils/utils.py).
  * All are codegen'd native expressions — no UDFs in the hot path.
  */
object TextFunctions {

  /** T1 character_tokenizer (text.py:7-11). */
  def charTokens(c: Column): Column = split(c, "")

  /** T2 space_tokenizer (text.py:13-16). */
  def spaceTokens(c: Column): Column = split(c, " ")

  /** T3 pad (text.py:18-40): pad every token array in the frame to the
    * global max length with `padToken`. The max is a tiny aggregate
    * broadcast back into the plan (no global window). */
  def padToMax(df: DataFrame, tokenCol: String, padToken: String): DataFrame = {
    // max over zero rows is NULL — an upstream stage that filtered
    // everything away must get the empty frame back, not an NPE
    val maxRow = df.agg(max(size(col(tokenCol)))).head()
    if (maxRow.isNullAt(0)) return df
    val maxLen = maxRow.getInt(0)
    df.withColumn(tokenCol,
      concat(col(tokenCol),
        array_repeat(lit(padToken), lit(maxLen) - size(col(tokenCol)))))
  }

  /** A2 make_vocabulary (text.py:74-93): token → frequency, with an
    * optional min-count cutoff. explode → hash-agg (map-side partial
    * combine keeps the shuffle proportional to distinct tokens). */
  def vocabulary(df: DataFrame, textCol: String, minCount: Long): DataFrame =
    df.select(explode(spaceTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** T6 make_indices (text.py:95-104): dense token ids, most-frequent
    * first (ties broken by token). Distributed rank via Frame.fromDF —
    * no single-partition window even for huge vocabularies. */
  def tokenIndices(vocab: DataFrame): DataFrame = {
    val ranked = Frame.fromDF(
      vocab.withColumn("__negcnt", -col("cnt")), Seq("__negcnt", "token"))
    ranked.df.drop("__negcnt")
      .withColumnRenamed(Frame.IDX, "token_id")
  }

  /** Reserved marker ids (text.py:95-104: `make_indices` assigns real
    * tokens ids from `count(start=3)`, reserving three slots; the
    * reference never actually defines its `special_tokens` dict — the
    * start-at-3 convention is what pins {SOS:0, EOS:1, UNK:2}). */
  val SosId = 0L
  val EosId = 1L
  val UnkId = 2L

  /** T6 make_indices with the reserved markers (text.py:95-104):
    * vocabulary ids start at 3, most-frequent first, and the SOS/EOS/
    * UNK rows join the table so `applyEmbeddings` can treat markers
    * like any other lookup. */
  def tokenIndicesWithSpecials(vocab: DataFrame): DataFrame = {
    val s = vocab.sparkSession
    import s.implicits._
    val specials = Seq(("SOS", SosId), ("EOS", EosId), ("UNK", UnkId))
      .toDF("token", "token_id")
    tokenIndices(vocab)
      .select(col("token"), (col("token_id") + 3).as("token_id"))
      .unionByName(specials)
  }

  /** T4 apply_embeddings (text.py:42-55): per-token lookup through a
    * broadcast (token → id/vector) table; unknown tokens map to
    * `unkId`. The map side stays a codegen'd expression over the
    * exploded tokens; the lookup join is broadcast — no shuffle of the
    * corpus. */
  def lookupTokenIds(docs: DataFrame, docIdCol: String, textCol: String,
                     indices: DataFrame, unkId: Long): DataFrame = {
    val toks = docs.select(col(docIdCol),
        posexplode(spaceTokens(col(textCol))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    toks.join(broadcast(indices.select("token", "token_id")), Seq("token"), "left")
      .withColumn("token_id", coalesce(col("token_id"), lit(unkId)))
  }

  /** T4 apply_embeddings, full sequence contract (text.py:42-55): each
    * document becomes `[SOS] + ids + [EOS]` with unknown tokens mapped
    * to UNK, and an empty/blank document becomes exactly `[SOS, EOS]`
    * (text.py:54-55). The per-doc regroup sorts the collected
    * (pos, id) structs — a hash aggregation on the doc key, shuffle ∝
    * total tokens, no window. */
  def applyEmbeddings(docs: DataFrame, docIdCol: String, textCol: String,
                      indices: DataFrame): DataFrame = {
    val ids = lookupTokenIds(docs, docIdCol, textCol, indices, UnkId)
      .groupBy(col(docIdCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("token_id")))),
        s => s.getField("token_id")).as("__ids"))
    docs.select(col(docIdCol), col(textCol))
      .join(ids, Seq(docIdCol), "left")
      .withColumn("token_ids",
        concat(array(lit(SosId)),
          coalesce(col("__ids"), array().cast("array<bigint>")),
          array(lit(EosId))))
      .drop("__ids")
  }

  /** T5 create_pretrained_embeddings (text.py:57-72): GloVe-style
    * space-separated text file → (token, vector) table, ready to
    * broadcast into `lookupTokenIds`-style joins. */
  def loadEmbeddings(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    raw.select(split(col("value"), " ").as("parts"))
      .select(col("parts").getItem(0).as("token"),
        expr("transform(slice(parts, 2, size(parts) - 1), x -> cast(x as float))").as("vector"))
  }

  /** Document chunking (LLM-pipeline parity-plus): overlapping
    * character windows of `size` every `stride` chars — one row per
    * chunk, pure expressions (explode of a computed offset sequence).
    * Chunk i covers [i·stride, i·stride + size); the last window
    * starts below the text length. */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0)
    val nChunks = floor((length(col(textCol)) - 1) / stride).cast("int")
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), greatest(nChunks, lit(0))),
          i => col(textCol).substr(i * stride + 1, lit(size))))
          .as(Seq("chunk_no", "chunk")))
      .filter(length(col("chunk")) > 0)
  }

  /** T7 one_hot (utils/utils.py:4-17): int → float one-hot array, as a
    * pure array expression (no UDF, no Spark-ML pipeline state). */
  def oneHot(c: Column, numClasses: Int): Column =
    transform(sequence(lit(0), lit(numClasses - 1)),
      i => when(i === c.cast("int"), lit(1.0f)).otherwise(lit(0.0f)))

  /** oneHot with a column-valued class count (e.g. joined in from an
    * aggregate); yields an empty vector when `numClasses` <= 0 —
    * `sequence(0, n-1)` alone would count DOWN for n <= 0. */
  def oneHot(c: Column, numClasses: Column): Column =
    when(numClasses > 0,
      transform(sequence(lit(0), numClasses.cast("int") - 1),
        i => when(i === c.cast("int"), lit(1.0f)).otherwise(lit(0.0f))))
      .otherwise(array().cast("array<float>"))
}
