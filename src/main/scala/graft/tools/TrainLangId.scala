package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerate [[graft.functions.LangIdWeights]] from the multilingual
  * training fixture: runs [[graft.functions.LangIdModel.trainDefault]]
  * (the repo Trainer's deterministic one-vs-rest Adam SGD) and prints
  * the Scala source of the pinned constants. Provenance for the
  * shipped numbers — CurationSpec re-runs the same training and
  * asserts bit-equality, so the constants cannot drift silently.
  *
  * Run: sbt "runMain graft.tools.TrainLangId" and paste the output
  * over LangIdWeights.scala's W/B.
  */
object TrainLangId {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("train-langid")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{LangIdModel, QualityFilter}
    val heads = LangIdModel.trainDefault(spark)
    println("  val W: Seq[Array[Long]] = Seq(")
    println(heads.map { case (w, _) =>
      "    Array(\n" + w.grouped(8).map(g => "      " + g.mkString("L, ") + "L")
        .mkString(",\n") + ")"
    }.mkString(",\n"))
    println("  )")
    println(s"  val B: Seq[Long] = Seq(${heads.map(_._2 + "L").mkString(", ")})")
    // fixture accuracy under the argmax convention
    val acc = LangIdModel.TrainingFixture.count { case (lang, t) =>
      val x = QualityFilter.featuresOf(t)
      val scores = heads.map { case (w, b) =>
        x.zip(w).map { case (xi, wi) => xi * wi }.sum + b
      }
      val best = scores.zip(LangIdModel.Classes)
        .reduceLeft((a, h) => if (h._1 > a._1) h else a)
      best._2 == lang
    }
    println(s"// fixture accuracy: $acc/${LangIdModel.TrainingFixture.size}")
    spark.stop()
  }
}
