package graft.train

import org.apache.spark.sql.functions._
import graft.frame.Frame
import graft.model.LinearModel
import graft.operators.Pipes

/** U8 training driver (reference: IgniteJunction,
  * extensions/training.py:50-183): epochs of shuffled minibatches with
  * per-batch gradient updates. The driver holds the (tiny) parameter
  * vector; the cluster serves shuffled batches — the exact split of
  * labor the reference runs single-process.
  *
  * For production-size linear fits prefer LinearModel.fit (one exact
  * pass); this loop exists for training-semantics parity and for
  * models that genuinely need SGD.
  */
object Trainer {

  final case class SgdConfig(lr: Double, epochs: Int, batchSize: Int, seed: Long)

  def sgdLinear(f: Frame, xCols: Seq[String], yCol: String,
                cfg: SgdConfig): LinearModel =
    sgdLinear(f, xCols, yCol, cfg, LinearModel("sgd_linear", xCols, yCol))

  /** Continue training an existing model in place: starts from its
    * current parameters and SKIPS updates to frozen components
    * (model.py:424-452 — frozen params still feed the prediction and
    * the error term; they just receive no gradient step). Writes the
    * result back through the model's ComponentMap, so externally
    * linked (shared) parameters propagate to every model holding them. */
  def sgdLinear(f: Frame, xCols: Seq[String], yCol: String,
                cfg: SgdConfig, model: LinearModel): LinearModel = {
    val p = xCols.size
    val w = model.components("m").clone()
    var b = model.components("b")(0)
    val mFrozen = model.components.isFrozen("m")
    val bFrozen = model.components.isFrozen("b")
    for (epoch <- 0 until cfg.epochs) {
      val shuffled = Pipes.shuffle(f, cfg.seed + epoch)
        .cols(xCols :+ yCol: _*)
      for (batch <- Pipes.batchIterator(shuffled, cfg.batchSize)) {
        var gb = 0.0
        val gw = Array.fill(p)(0.0)
        batch.foreach { r =>
          val xs = xCols.map(c => toDouble(r.getAs[Any](c)))
          val y = toDouble(r.getAs[Any](yCol))
          val pred = (0 until p).map(i => w(i) * xs(i)).sum + b
          val err = pred - y
          (0 until p).foreach(i => gw(i) += err * xs(i))
          gb += err
        }
        val n = batch.size
        if (!mFrozen) (0 until p).foreach(i => w(i) -= cfg.lr * gw(i) / n)
        if (!bFrozen) b -= cfg.lr * gb / n
      }
    }
    model.components("m") = w
    model.components("b") = Array(b)
    model
  }

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float  => f.toDouble
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case other => other.toString.toDouble
  }
}
