package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF corpus vectorization (text-analysis parity-plus): one
  * explode + two hash aggregations + a broadcast-sized idf join.
  * Shuffles are proportional to (doc, term) pairs and distinct terms —
  * never corpus². */
object TfIdf {

  /** Per-(doc, token) term frequency. */
  def termFrequency(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Smooth-free idf: ln(N / df). N passed in so the caller controls
    * the (single, tiny) count job. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    val tf = termFrequency(docs, idCol, textCol)
    val df = tf.groupBy("token").agg(countDistinct(col(idCol)).as("df"))
    tf.join(broadcast(df), Seq("token"))
      .withColumn("tfidf",
        col("tf").cast("double") * log(lit(n.toDouble) / col("df").cast("double")))
  }
}
