package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.frame.Frame
import graft.model.{ComponentMap, ComponentRef, LinearModel, ParamStore, Scaffold}
import graft.train.{Experiment, Factory, Trainer}
import graft.explain.Explain

/** Model/training/state semantics (mirrors the reference's convergence
  * and state tests: core/model_test.py:238-298, scaffold_test.py,
  * factory_test.py, experiment_test.py, explain_test.py).
  */
class ModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def syntheticLinear(n: Int, m: Double, b: Double, noise: Double): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (0 until n).map { i =>
      val x = math.round(rng.nextDouble() * 10000.0) / 100.0
      val y = math.round((m * x + b + rng.nextGaussian() * noise) * 100.0) / 100.0
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
  }

  test("fitSimple recovers exact generating params on noiseless data") {
    val df = syntheticLinear(300, 2.0, 1.0, 0.0)
    val (slope, intercept) = LinearModel.fitSimple(df, "x", "y")
    assert(math.abs(slope - 2.0) < 1e-6 && math.abs(intercept - 1.0) < 1e-6)
  }

  test("fit fails loudly when values overflow the decimal accumulator (no silent drop)") {
    import spark.implicits._
    // 1e17 overflows decimal(18,2)'s 16 integer digits. Under ANSI mode
    // (Spark 4 default) the cast itself throws; with ANSI off, the
    // count-sentinel inside fit throws. Either way: loud, not a silent
    // drop from the sums.
    val df = Seq((1.0, 2.0), (1.0e17, 3.0)).toDF("x", "y")
    def overflows(e: Throwable): Boolean = {
      val m = String.valueOf(e.getMessage)
      m.contains("overflow") || m.contains("NUMERIC_VALUE_OUT_OF_RANGE")
    }
    assert(overflows(intercept[Exception] { LinearModel.fitSimple(df, "x", "y") }))
    assert(overflows(intercept[Exception] { graft.prep.Normalizer.fit(df, Seq("x")) }))
    // widening the accumulator makes the same data fit (integer data, scale 0)
    val (slope, _) = LinearModel.fitSimple(df, "x", "y", precision = 19, scale = 0)
    assert(!slope.isNaN)
  }

  test("Normalizer scale parameter controls quantization of fine-precision data") {
    import spark.implicits._
    val df = Seq(0.001, 0.002, 0.003).toDF("x")
    // scale=2 quantizes everything to 0.00 -> variance 0
    val coarse = graft.prep.Normalizer.fit(df, Seq("x"))
    assert(coarse.stats("x") == ((0.0, 0.0)))
    // scale=6 captures the data exactly
    val fine = graft.prep.Normalizer.fit(df, Seq("x"), precision = 18, scale = 6)
    assert(math.abs(fine.stats("x")._1 - 0.002) < 1e-12)
    assert(fine.stats("x")._2 > 0.0)
  }

  test("multi-feature fit recovers generating params (reference tolerance 0.6)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val df = (0 until 550).map { i =>
      val x1 = math.round(rng.nextDouble() * 1000.0) / 100.0
      val x2 = math.round(rng.nextDouble() * 1000.0) / 100.0
      val y = math.round((2.0 * x1 - 3.0 * x2 + 5.0 + rng.nextGaussian() * 0.1) * 100.0) / 100.0
      (i.toLong, x1, x2, y)
    }.toDF("id", "x1", "x2", "y")
    val model = LinearModel.fit(df, Seq("x1", "x2"), "y")
    assert(math.abs(model.m(0) - 2.0) < 0.6)
    assert(math.abs(model.m(1) + 3.0) < 0.6)
    assert(math.abs(model.b - 5.0) < 0.6)
    // transform adds y_pred
    assert(model.transform(df).columns.contains("y_pred"))
  }

  test("SGD training loop converges (reference model_test.py:238-253 style)") {
    val df = syntheticLinear(300, 2.0, 1.0, 0.4)
    val f = Frame.fromDF(df, Seq("id"))
    val model = Trainer.sgdLinear(f, Seq("x"), "y",
      Trainer.SgdConfig(lr = 0.0003, epochs = 12, batchSize = 25, seed = 11L))
    assert(math.abs(model.m(0) - 2.0) < 0.6, s"slope=${model.m(0)}")
  }

  test("Adam reaches tolerance in fewer epochs than plain SGD (optimizer surface, training.py:57-77)") {
    // mismatched feature scales — the fixture where the optimizers
    // genuinely differ: x1 ~ [0,100], x2 ~ [0,1] gives a 10⁴
    // curvature ratio, so plain SGD's single rate (capped by x1's
    // stability bound) leaves the x2 weight crawling, while Adam's
    // per-parameter normalization fits both at once
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val df = (0 until 300).map { i =>
      val x1 = math.round(rng.nextDouble() * 10000.0) / 100.0
      val x2 = math.round(rng.nextDouble() * 100.0) / 100.0
      val y = math.round((2.0 * x1 + 2.0 * x2 + rng.nextGaussian() * 0.2) * 100.0) / 100.0
      (i.toLong, x1, x2, y)
    }.toDF("id", "x1", "x2", "y")
    val f = Frame.fromDF(df, Seq("id"))
    def errs(m: graft.model.LinearModel): (Double, Double) =
      (math.abs(m.m(0) - 2.0), math.abs(m.m(1) - 2.0))
    // Adam: BOTH weights inside tolerance after 2 epochs
    val adam = Trainer.sgdLinear(f, Seq("x1", "x2"), "y",
      Trainer.SgdConfig(lr = 0.1, epochs = 2, batchSize = 25, seed = 11L,
        optimizer = Trainer.Adam()))
    val (a1, a2) = errs(adam)
    assert(a1 < 0.5 && a2 < 0.5, s"adam errors after 2 epochs: ($a1, $a2)")
    // SGD: the small-scale weight is still far off after 16 epochs —
    // Adam converged in strictly fewer epochs
    val sgd = Trainer.sgdLinear(f, Seq("x1", "x2"), "y",
      Trainer.SgdConfig(lr = 0.0003, epochs = 16, batchSize = 25, seed = 11L))
    val (s1, s2) = errs(sgd)
    assert(s1 < 0.5, s"sgd large-scale weight diverged: $s1")
    assert(s2 > 0.5, s"sgd small-scale weight unexpectedly converged: $s2")
    // momentum: state plumbing converges the large-scale weight
    val mom = Trainer.sgdLinear(f, Seq("x1", "x2"), "y",
      Trainer.SgdConfig(lr = 0.0003, epochs = 8, batchSize = 25, seed = 11L,
        optimizer = Trainer.Momentum()))
    assert(errs(mom)._1 < 0.5, s"momentum large-scale weight=${mom.m(0)}")
  }

  test("LR schedules apply per epoch (scheduler surface, training.py:66-77)") {
    val df = syntheticLinear(200, 2.0, 1.0, 0.4)
    val f = Frame.fromDF(df, Seq("id"))
    // StepDecay(1, 0) zeroes the rate after epoch 0: five scheduled
    // epochs must land EXACTLY where one unscheduled epoch does
    val one = Trainer.sgdLinear(f, Seq("x"), "y",
      Trainer.SgdConfig(lr = 0.0003, epochs = 1, batchSize = 25, seed = 11L))
    val stepped = Trainer.sgdLinear(f, Seq("x"), "y",
      Trainer.SgdConfig(lr = 0.0003, epochs = 5, batchSize = 25, seed = 11L,
        schedule = Trainer.StepDecay(stepEvery = 1, gamma = 0.0)))
    assert(stepped.m(0) == one.m(0) && stepped.b == one.b)
    // the multiplier curves themselves
    assert(Trainer.ExpDecay(0.5).mult(3) == 0.125)
    assert(Trainer.StepDecay(2, 0.1).mult(3) == 0.1)
    assert(math.abs(Trainer.CosineAnneal(10).mult(5) - 0.5) < 1e-12)
    assert(Trainer.CosineAnneal(10).mult(0) == 1.0)
    // cosine-scheduled run still converges on the well-scaled fixture
    val cos = Trainer.sgdLinear(f, Seq("x"), "y",
      Trainer.SgdConfig(lr = 0.0003, epochs = 12, batchSize = 25, seed = 11L,
        schedule = Trainer.CosineAnneal(tMax = 12)))
    assert(math.abs(cos.m(0) - 2.0) < 0.6, s"cosine slope=${cos.m(0)}")
  }

  test("freeze/unfreeze toggle per component, and propagate through shared links (model_test.py:179-227)") {
    val a = LinearModel("a", Seq("x"), "y")
    assert(!a.components.isFrozen("m") && !a.components.isFrozen("b"))
    a.freeze() // no args = all components
    assert(a.components.isFrozen("m") && a.components.isFrozen("b"))
    a.unfreeze()
    assert(!a.components.isFrozen("m") && !a.components.isFrozen("b"))
    a.freeze("m")
    assert(a.components.isFrozen("m") && !a.components.isFrozen("b"))
    assert(a.components.frozenKeys == Seq("m"), "frozenKeys lists exactly the frozen subset")
    a.unfreeze("m")
    // the flag lives with the parameter: freezing a SHARED component in
    // one model freezes it in every model linking it (requires_grad on
    // the shared torch Parameter)
    val store = new ParamStore
    store.set("shared_m", Array(0.0))
    val b = LinearModel("b", Seq("x"), "y")
    a.components.link("m", ComponentRef(store, "shared_m"))
    b.components.link("m", ComponentRef(store, "shared_m"))
    a.freeze("m")
    assert(b.components.isFrozen("m"), "freeze must travel with the shared parameter")
    assert(!b.components.isFrozen("b"))
    b.unfreeze("m")
    assert(!a.components.isFrozen("m"))
  }

  test("frozen components receive no SGD updates; shared free params converge (model_test.py:255-298)") {
    // the reference's multiple-Models composition: the slope parameter
    // is shared into the trained model through the store, the intercept
    // is frozen at 0 — after training the frozen param is bit-unchanged
    // and the free one converged (data: y = 2x + 0, so truth has b=0)
    val df = syntheticLinear(300, 2.0, 0.0, 0.4)
    val store = new ParamStore
    store.set("shared_m", Array(0.0))
    val owner = LinearModel("owner", Seq("x"), "y")
    owner.components.link("m", ComponentRef(store, "shared_m"))
    val trained = LinearModel("multi", Seq("x"), "y")
    trained.components.link("m", ComponentRef(store, "shared_m"))
    trained.freeze("b")
    Trainer.sgdLinear(Frame.fromDF(df, Seq("id")), Seq("x"), "y",
      Trainer.SgdConfig(lr = 0.0003, epochs = 12, batchSize = 25, seed = 11L), trained)
    assert(trained.b == 0.0, s"frozen intercept moved: ${trained.b}")
    assert(math.abs(trained.m(0) - 2.0) < 0.6, s"slope=${trained.m(0)}")
    // sharing: the owner model sees the converged slope through the store
    assert(owner.m(0) == trained.m(0))
  }

  test("fitFrom solves free params exactly, conditioned on frozen ones") {
    import spark.implicits._
    // noiseless y = 2x + 5 at 2-dp: closed form is exact
    val df = (1 to 200).map { i =>
      val x = i / 4.0; (x, 2.0 * x + 5.0)
    }.toDF("x", "y")
    // frozen intercept at its true value -> slope solves to exactly 2
    val mFix = new LinearModel("f1", Seq("x"), "y", "y_pred",
      ComponentMap.of("m" -> Array(0.0), "b" -> Array(5.0)))
    mFix.freeze("b")
    LinearModel.fitFrom(df, mFix)
    assert(mFix.b == 5.0 && math.abs(mFix.m(0) - 2.0) < 1e-9, s"m=${mFix.m(0)} b=${mFix.b}")
    // frozen slope at truth -> intercept solves to exactly 5
    val bFix = new LinearModel("f2", Seq("x"), "y", "y_pred",
      ComponentMap.of("m" -> Array(2.0), "b" -> Array(0.0)))
    bFix.freeze("m")
    LinearModel.fitFrom(df, bFix)
    assert(bFix.m(0) == 2.0 && math.abs(bFix.b - 5.0) < 1e-9, s"m=${bFix.m(0)} b=${bFix.b}")
    // everything frozen: a no-op, no aggregation result applied
    val frozen = new LinearModel("f3", Seq("x"), "y", "y_pred",
      ComponentMap.of("m" -> Array(7.0), "b" -> Array(8.0)))
    frozen.freeze()
    LinearModel.fitFrom(df, frozen)
    assert(frozen.m(0) == 7.0 && frozen.b == 8.0)
    // nothing frozen: agrees with plain fit
    val free = LinearModel("f4", Seq("x"), "y")
    LinearModel.fitFrom(df, free)
    val plain = LinearModel.fit(df, Seq("x"), "y")
    assert(free.m(0) == plain.m(0) && free.b == plain.b)
  }

  test("ComponentMap external links share state between models") {
    val store = new ParamStore
    store.set("shared_m", Array(1.5))
    val a = ComponentMap.of("b" -> Array(0.0)); a.link("m", ComponentRef(store, "shared_m"))
    val bM = ComponentMap.of("b" -> Array(9.0)); bM.link("m", ComponentRef(store, "shared_m"))
    a("m") = Array(2.5)
    assert(bM("m").sameElements(Array(2.5)))
    val (internal, external) = a.getState
    assert(internal.keySet == Set("b") && external == Map("m" -> "shared_m"))
  }

  test("Scaffold save/load round-trips model parameters") {
    val dir = java.nio.file.Files.createTempDirectory("scaffold").toString
    val m1 = new LinearModel("m1", Seq("x"), "y", "y_pred",
      ComponentMap.of("m" -> Array(3.25), "b" -> Array(-1.5)))
    new Scaffold().attach(m1).save(dir)
    m1.components("m") = Array(0.0); m1.components("b") = Array(0.0)
    new Scaffold().attach(m1).load(dir)
    assert(m1.m.sameElements(Array(3.25)) && m1.b == -1.5)
  }

  test("Normalizer participates in Scaffold state save/load as a Model") {
    import graft.prep.Normalizer
    val df = syntheticLinear(100, 2.0, 1.0, 0.0)
    val nm = Normalizer.fitModel(df, Seq("x"), "norm")
    val meanBefore = nm.components("mean:x")(0)
    val dir = java.nio.file.Files.createTempDirectory("normscaf").toString
    new Scaffold().attach(nm).save(dir)
    nm.components("mean:x") = Array(0.0)
    new Scaffold().attach(nm).load(dir)
    assert(nm.components("mean:x")(0) == meanBefore)
    // transform actually z-scores
    val stats = nm.transform(df).agg(
      org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.avg("x"), 6),
      org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.var_pop("x"), 6)).head()
    assert(math.abs(stats.getDouble(0)) < 1e-6 && math.abs(stats.getDouble(1) - 1.0) < 1e-6)
  }

  test("Factory grid search over a parquet-backed trial store") {
    val dir = java.nio.file.Files.createTempDirectory("trials").toString + "/t"
    val store = new Factory.ParquetStore(spark, dir)
    val space = Seq(0.5, 1.0, 2.0, 4.0).map(v => Map("scale" -> v))
    val trials = Factory.search(
      Factory.grid(space),
      params => Map("loss" -> math.abs(params("scale") - 2.0)),
      store)
    assert(trials.size == 4)
    assert(trials.minBy(_.metrics("loss")).params("scale") == 2.0)
    assert(store.asDataFrame.count() == 4)
  }

  test("Experiment directory + metadata round-trip") {
    val base = java.nio.file.Files.createTempDirectory("exp").toString
    val e1 = new Experiment("run", base, spark)
    val e2 = new Experiment("run", base, spark)
    assert(e1.dir != e2.dir) // uniquified run_0, run_1
    e1.logMetadata(0L, "first", 1700000000000L)
    e1.logMetadata(1L, "second", 1700000001000L)
    assert(e1.metadata.count() == 2)
    e1.saveTable("preds", syntheticLinear(10, 1.0, 0.0, 0.0))
    assert(e1.loadTable("preds").count() == 10)
  }

  test("Occlusion-1 equals analytic m*(x-mu) for a linear model") {
    val df = syntheticLinear(100, 2.0, 1.0, 0.0)
    val model = new LinearModel("m", Seq("x"), "y", "y_pred",
      ComponentMap.of("m" -> Array(2.0), "b" -> Array(1.0)))
    val mu = 50.0
    val out = Explain.occlusion1(model.transform, df, Seq("id"), Seq("x"),
      Map("x" -> mu), "y_pred")
    val bad = out.withColumn("expected", lit(2.0) * (col("x") - lit(mu)))
      .filter(abs(col("occl_x") - col("expected")) > 1e-9).count()
    assert(bad == 0)
  }

  test("GradientxInput and IntegratedGradients equal their analytic forms for a linear model") {
    val df = syntheticLinear(100, 2.0, 1.0, 0.0)
    val model = new LinearModel("m", Seq("x"), "y", "y_pred",
      ComponentMap.of("m" -> Array(2.0), "b" -> Array(1.0)))
    // U11: x · dY/dx = 2x (numeric central difference of a linear
    // forward is exact up to fp noise)
    val gxi = Explain.gradientXInput(model.transform, df, Seq("id"), Seq("x"), "y_pred")
    assert(gxi.filter(abs(col("gxi_x") - lit(2.0) * col("x")) > 1e-6).count() == 0)
    // U12: IG over the straight path from baseline mu = m·(x-mu)
    val mu = 50.0
    val ig = Explain.integratedGradients(model.transform, df, Seq("id"), Seq("x"),
      Map("x" -> mu), "y_pred", steps = 4)
    assert(ig.filter(abs(col("ig_x") - lit(2.0) * (col("x") - lit(mu))) > 1e-6).count() == 0)
  }

  test("null rows are excluded as complete cases, not mixed into the intercept moment") {
    import spark.implicits._
    val clean = syntheticLinear(200, 2.0, 1.0, 0.0)
    val dirty = clean.unionByName(
      Seq((9001L, 5.0, Option.empty[Double]), (9002L, 6.0, Option.empty[Double]))
        .toDF("id", "x", "y"))
    val (s1v, i1) = LinearModel.fitSimple(clean, "x", "y")
    val (s2v, i2) = LinearModel.fitSimple(dirty, "x", "y")
    assert(s1v == s2v && i1 == i2, "null-y rows must not skew the closed form")
    val m1 = LinearModel.fit(clean, Seq("x"), "y")
    val m2 = LinearModel.fit(dirty, Seq("x"), "y")
    assert(m1.m.sameElements(m2.m) && m1.b == m2.b,
      "null-y rows must not enter the intercept moment of XtX")
  }

  test("singular normal equations fail loudly instead of emitting NaN weights") {
    val df = syntheticLinear(100, 2.0, 1.0, 0.0)
      .withColumn("x2", org.apache.spark.sql.functions.col("x"))
    val e = intercept[IllegalArgumentException] {
      LinearModel.fit(df, Seq("x", "x2"), "y")
    }
    assert(e.getMessage.contains("singular"))
  }

  test("sgdLinear trains on a dataset smaller than batchSize (no silent zero-batch no-op)") {
    val df = syntheticLinear(50, 2.0, 1.0, 0.0)
    val f = graft.frame.Frame.fromDF(df, Seq("id"))
    val m = Trainer.sgdLinear(f, Seq("x"), "y",
      Trainer.SgdConfig(lr = 0.0003, epochs = 40, batchSize = 64, seed = 3L))
    assert(m.m(0) != 0.0, "model returned untrained: zero batches ran")
    assert(math.abs(m.m(0) - 2.0) < 0.6, s"slope=${m.m(0)}")
  }

  test("CosineAnneal holds the floor beyond tMax (no warm-restart jump)") {
    val sch = Trainer.CosineAnneal(tMax = 10, etaMinFrac = 0.125)
    assert(math.abs(sch.mult(10) - 0.125) < 1e-12, "floor must be reached AT tMax")
    assert(math.abs(sch.mult(17) - 0.125) < 1e-12, "beyond tMax must hold, not restart")
    assert(sch.mult(0) == 1.0)
  }

  test("Scaffold save/load round-trips SHARED parameter values into a fresh store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaffold_shared").toString
    val store = new ParamStore
    store.set("shared_m", Array(3.25))
    val a = LinearModel("a", Seq("x"), "y")
    val b = LinearModel("b", Seq("x"), "y")
    a.components.link("m", ComponentRef(store, "shared_m"))
    b.components.link("m", ComponentRef(store, "shared_m"))
    a.components("b") = Array(7.5)
    new Scaffold().attach(a).attach(b).save(dir)

    // fresh process: models re-created, links re-wired to a FRESH store
    val store2 = new ParamStore
    store2.set("shared_m", Array(0.0))
    val a2 = LinearModel("a", Seq("x"), "y")
    val b2 = LinearModel("b", Seq("x"), "y")
    a2.components.link("m", ComponentRef(store2, "shared_m"))
    b2.components.link("m", ComponentRef(store2, "shared_m"))
    new Scaffold().attach(a2).attach(b2).load(dir)
    assert(a2.m.sameElements(Array(3.25)), s"shared value lost: ${a2.m.toSeq}")
    assert(b2.m.sameElements(Array(3.25)), "sharing must survive the round-trip")
    assert(a2.b == 7.5, "internal values restore as before")
  }
}
