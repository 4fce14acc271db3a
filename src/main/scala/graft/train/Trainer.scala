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
  * The optimizer step mirrors the reference's optimizer surface
  * (extensions/training.py:57-77 exposes the torch optimizer matrix)
  * for the testable linear case: plain SGD, heavy-ball momentum, and
  * Adam — all driver-side math over the KB-scale parameter vector, so
  * the cluster-side plan (shuffled batch serving) is identical for
  * every optimizer.
  *
  * For production-size linear fits prefer LinearModel.fit (one exact
  * pass); this loop exists for training-semantics parity and for
  * models that genuinely need SGD.
  */
object Trainer {

  /** Optimizer step rule for the driver-side update loop. */
  sealed trait Optimizer
  /** Plain SGD: p -= lr · g. */
  case object Sgd extends Optimizer
  /** Heavy-ball momentum: v = mu·v + g; p -= lr · v. */
  final case class Momentum(mu: Double = 0.9) extends Optimizer
  /** Adam (Kingma & Ba): bias-corrected first/second moments. */
  final case class Adam(beta1: Double = 0.9, beta2: Double = 0.999,
                        eps: Double = 1e-8) extends Optimizer

  /** Learning-rate schedule: per-epoch multiplier on the base rate
    * (epoch is 0-based) — the reference's scheduler surface
    * (training.py:66-77) for the schedules expressible as a pure
    * epoch → factor map. */
  sealed trait Schedule { def mult(epoch: Int): Double }
  /** Fixed rate. */
  case object Constant extends Schedule {
    override def mult(epoch: Int): Double = 1.0
  }
  /** Multiply by `gamma` every `stepEvery` epochs (torch StepLR). */
  final case class StepDecay(stepEvery: Int, gamma: Double) extends Schedule {
    require(stepEvery >= 1, "need stepEvery >= 1")
    override def mult(epoch: Int): Double = math.pow(gamma, epoch / stepEvery)
  }
  /** Multiply by `gamma` every epoch (torch ExponentialLR). */
  final case class ExpDecay(gamma: Double) extends Schedule {
    override def mult(epoch: Int): Double = math.pow(gamma, epoch)
  }
  /** Cosine annealing from 1 down to `etaMinFrac` over `tMax` epochs
    * (torch CosineAnnealingLR). Epochs beyond `tMax` HOLD the floor —
    * the `% tMax` form would warm-restart to full rate at epoch tMax
    * (a discontinuous jump late in training) and never actually reach
    * the advertised minimum. */
  final case class CosineAnneal(tMax: Int, etaMinFrac: Double = 0.0) extends Schedule {
    require(tMax >= 1, "need tMax >= 1")
    override def mult(epoch: Int): Double =
      etaMinFrac + (1 - etaMinFrac) *
        (1 + math.cos(math.Pi * math.min(epoch, tMax).toDouble / tMax)) / 2
  }

  final case class SgdConfig(lr: Double, epochs: Int, batchSize: Int, seed: Long,
                             optimizer: Optimizer = Sgd,
                             schedule: Schedule = Constant)

  def sgdLinear(f: Frame, xCols: Seq[String], yCol: String,
                cfg: SgdConfig): LinearModel =
    sgdLinear(f, xCols, yCol, cfg, LinearModel("sgd_linear", xCols, yCol))

  /** Per-parameter optimizer state: one slot per weight + one for the
    * bias (index p). */
  private final class OptState(n: Int, opt: Optimizer) {
    private val m = Array.fill(n)(0.0) // momentum / first moment
    private val v = Array.fill(n)(0.0) // second moment (Adam)
    private var t = 0                  // Adam step count

    def beginStep(): Unit = opt match {
      case Adam(_, _, _) => t += 1
      case _             => ()
    }

    /** The (lr-scaled) update for gradient `g` at slot `i`. */
    def step(i: Int, g: Double, lr: Double): Double = opt match {
      case Sgd => lr * g
      case Momentum(mu) =>
        m(i) = mu * m(i) + g
        lr * m(i)
      case Adam(b1, b2, eps) =>
        m(i) = b1 * m(i) + (1 - b1) * g
        v(i) = b2 * v(i) + (1 - b2) * g * g
        val mh = m(i) / (1 - math.pow(b1, t))
        val vh = v(i) / (1 - math.pow(b2, t))
        lr * mh / (math.sqrt(vh) + eps)
    }
  }

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
    val state = new OptState(p + 1, cfg.optimizer)
    for (epoch <- 0 until cfg.epochs) {
      val lr = cfg.lr * cfg.schedule.mult(epoch)
      val shuffled = Pipes.shuffle(f, cfg.seed + epoch)
        .cols(xCols :+ yCol: _*)
      // grouped, NOT Pipes.batchIterator: the O2 pipe's drop-ragged-tail
      // semantic would make a dataset smaller than batchSize train ZERO
      // batches and return the initial weights as if fitted. The tail
      // batch's gradient is normalized by its own size, so it is a
      // well-scaled step, not noise.
      for (batch <- shuffled.iterator.grouped(cfg.batchSize)) {
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
        state.beginStep()
        if (!mFrozen) (0 until p).foreach(i => w(i) -= state.step(i, gw(i) / n, lr))
        if (!bFrozen) b -= state.step(p, gb / n, lr)
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
