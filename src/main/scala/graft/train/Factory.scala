package graft.train

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** U9/U10 hyperparameter search (reference: extensions/factory.py).
  *
  * `Factory.search` runs the reference's loop — parameterizer proposes
  * from past trials, trainer/evaluator scores, store records — with the
  * stop-exception replaced by an Option. Stores: in-memory (reference
  * LocalMemoryFactory) and parquet-table-backed (reference SQLFactory's
  * role, sans DBMS — the trials table IS a DataFrame).
  */
object Factory {

  final case class Trial(params: Map[String, Double], metrics: Map[String, Double])

  trait TrialStore {
    def write(t: Trial): Unit
    def read(): Seq[Trial]
  }

  final class LocalMemoryStore extends TrialStore {
    private val trials = scala.collection.mutable.ArrayBuffer[Trial]()
    def write(t: Trial): Unit = trials += t
    def read(): Seq[Trial] = trials.toSeq
  }

  /** Trials persisted as a parquet table (append per trial; reload on
    * read). Survives the driver, queryable like any table. */
  final class ParquetStore(spark: SparkSession, dir: String) extends TrialStore {
    import spark.implicits._
    def write(t: Trial): Unit =
      Seq((t.params.toSeq.sortBy(_._1), t.metrics.toSeq.sortBy(_._1)))
        .toDF("params", "metrics")
        .write.mode("append").parquet(dir)
    def read(): Seq[Trial] = {
      // "no trials yet" is ONLY a missing/empty directory; any other
      // AnalysisException (corrupt footer, changed schema) must
      // propagate — swallowing it would restart the search from trial
      // 0 and append duplicates next to the existing data
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasData = fs.exists(p) &&
        fs.listStatus(p).exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (!hasData) Seq.empty
      else spark.read.parquet(dir).collect().toSeq.map { r =>
        Trial(
          r.getAs[Seq[org.apache.spark.sql.Row]]("params")
            .map(p => p.getString(0) -> p.getDouble(1)).toMap,
          r.getAs[Seq[org.apache.spark.sql.Row]]("metrics")
            .map(p => p.getString(0) -> p.getDouble(1)).toMap)
      }
    }
    def asDataFrame: DataFrame = spark.read.parquet(dir)
  }

  /** The search loop (factory.py:22-69): parameterizer returns None to
    * stop (reference raises EndHyperparameterOptimization). */
  def search(parameterizer: Seq[Trial] => Option[Map[String, Double]],
             evaluate: Map[String, Double] => Map[String, Double],
             store: TrialStore): Seq[Trial] = {
    var next = parameterizer(store.read())
    while (next.isDefined) {
      val params = next.get
      store.write(Trial(params, evaluate(params)))
      next = parameterizer(store.read())
    }
    store.read()
  }

  /** Deterministic grid parameterizer helper. */
  def grid(space: Seq[Map[String, Double]]): Seq[Trial] => Option[Map[String, Double]] =
    trials => space.drop(trials.size).headOption
}
