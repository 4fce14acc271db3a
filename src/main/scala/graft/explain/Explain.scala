package graft.explain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U13 Occlusion-1 attribution (reference: extensions/explain.py:133-178):
  * attribution of feature i for a row = model(x) - model(x with x_i
  * replaced by a baseline). Pure forward passes — no autograd — so it
  * runs fully distributed: p+1 model applications over one DataFrame
  * joined on row identity, no driver loop over rows.
  *
  * (U11/U12 gradient methods need autograd; out of scope per SURVEY
  * §2.12 — occlusion is the reference's gradient-free method.)
  */
object Explain {

  /** Returns the modeled frame plus one `occl_<col>` attribution column
    * per feature. `model` must add `predCol`; `baselines` supplies the
    * occlusion value per feature (commonly the column mean); `idCols`
    * identify rows across the p+1 applications (all p joins hash on the
    * same key, so after the first shuffle the rest co-partition). */
  def occlusion1(model: DataFrame => DataFrame, df: DataFrame,
                 idCols: Seq[String], xCols: Seq[String],
                 baselines: Map[String, Double], predCol: String): DataFrame = {
    val base = model(df)
    xCols.foldLeft(base) { (acc, c) =>
      val occ = model(df.withColumn(c, lit(baselines(c))))
        .select((idCols.map(col) :+ col(predCol).as(s"__occ_$c")): _*)
      acc.join(occ, idCols)
        .withColumn(s"occl_$c", col(predCol) - col(s"__occ_$c"))
        .drop(s"__occ_$c")
    }
  }
}
