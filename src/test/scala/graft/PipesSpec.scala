package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.frame.Frame
import graft.operators.Pipes
import graft.functions.TextFunctions

class PipesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def frame(n: Int): Frame = {
    import spark.implicits._
    Frame.fromDF((0 until n).map(i => (i.toLong, i.toDouble)).toDF("k", "v"), Seq("k"))
  }

  test("batchIterator yields fixed-size batches in positional order, ragged tail dropped") {
    val batches = Pipes.batchIterator(frame(23), 5).toSeq
    assert(batches.size == 4)
    assert(batches.forall(_.size == 5))
    assert(batches.head.map(_.getAs[Long]("k")) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("repeat is epoch-major (reference RepeaterPipe)") {
    val r = Pipes.repeat(frame(3), times = 2, n = 3L)
    assert(r.ordered.select("k").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 0L, 1L, 2L))
  }

  test("oversample with replacement renumbers densely (U16)") {
    val o = Pipes.oversample(frame(50), 2.0, seed = 3L)
    val idx = o.ordered.select(Frame.IDX).collect().map(_.getLong(0)).toSeq
    assert(idx == idx.indices.map(_.toLong))
    assert(o.length > 50)
  }

  test("seeded shuffle is a permutation and reproducible") {
    val f = frame(40)
    val s1 = Pipes.shuffle(f, 7L).ordered.select("k").collect().map(_.getLong(0)).toSeq
    val s2 = Pipes.shuffle(f, 7L).ordered.select("k").collect().map(_.getLong(0)).toSeq
    assert(s1 == s2)
    assert(s1.sorted == (0L until 40L))
    assert(s1 != (0L until 40L))
  }

  test("stratifiedSample draws per-class fractions reproducibly") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i.toLong, if (i % 4 == 0) "a" else "b"))
      .toDF("k", "cls")
    val f = Frame.fromDF(df, Seq("k"))
    val s1 = graft.prep.Preprocessing.stratifiedSample(
      f, "cls", Map[Any, Double]("a" -> 1.0, "b" -> 0.1), seed = 9L)
    val byCls = s1.df.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCls("a") == 100)                      // fraction 1.0 keeps all
    assert(byCls("b") > 5 && byCls("b") < 80)      // ~10% of 300
    val s2 = graft.prep.Preprocessing.stratifiedSample(
      f, "cls", Map[Any, Double]("a" -> 1.0, "b" -> 0.1), seed = 9L)
    assert(s1.sameAs(s2))                          // seeded reproducibility
  }

  test("loadEmbeddings parses GloVe-style text (T5)") {
    val dir = java.nio.file.Files.createTempDirectory("emb")
    java.nio.file.Files.writeString(dir.resolve("emb.txt"),
      "the 0.1 0.2 0.3\ncat -1.0 0.5 2.5\n")
    val e = TextFunctions.loadEmbeddings(spark, dir.toString)
    val m = e.collect().map(r => r.getString(0) ->
      r.getAs[scala.collection.Seq[Float]](1).toSeq).toMap
    assert(m("the") == Seq(0.1f, 0.2f, 0.3f))
    assert(m("cat") == Seq(-1.0f, 0.5f, 2.5f))
  }

  test("padToMax pads token arrays to the global maximum (T3)") {
    import spark.implicits._
    val df = Seq("a b c", "x", "p q").toDF("text")
      .select(TextFunctions.spaceTokens(col("text")).as("tokens"))
    val padded = TextFunctions.padToMax(df, "tokens", "<pad>")
    assert(padded.select(size(col("tokens"))).collect().map(_.getInt(0)).toSet == Set(3))
  }

  test("indexMap views the input through an index bijection (O5)") {
    // view row r = input[mapping(r)]: the train/test-split view machinery
    val f = frame(5)
    val view = Pipes.indexMap(f, Seq((4L, 0L), (0L, 1L), (2L, 2L)))
    assert(view.ordered.select("k").collect().map(_.getLong(0)).toSeq ==
      Seq(4L, 0L, 2L))
  }

  test("toTensor lifts scalar columns to float-array tensor columns (P4/M17)") {
    val t = Pipes.toTensor(frame(3), "v")
    assert(t.df.schema("v").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false))
    assert(t.ordered.select("v").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toSeq).toSeq ==
      Seq(Seq(0.0f), Seq(1.0f), Seq(2.0f)))
  }

  test("Model.fromFunction adapts a plain DataFrame transform (U3)") {
    val m = graft.model.Model.fromFunction("double_v",
      df => df.withColumn("v2", col("v") * 2.0))
    val out = m.transform(frame(3).df).select("v2").collect().map(_.getDouble(0)).toSeq
    assert(out.sorted == Seq(0.0, 2.0, 4.0))
    assert(m.name == "double_v" && m.components.keys.isEmpty)
  }

  test("repeat rejects non-positive times (sequence would count down)") {
    intercept[IllegalArgumentException] { Pipes.repeat(frame(3), 0, 3L) }
    intercept[IllegalArgumentException] { Pipes.repeat(frame(3), -1, 3L) }
  }

  test("labeler assigns dense alphabetical ids via broadcast join; empty input is empty") {
    import spark.implicits._
    val df = Seq((1L, "carrot"), (2L, "apple"), (3L, "banana"), (4L, "apple"))
      .toDF("k", "lbl")
    val out = Pipes.labeler(df, "lbl").orderBy("k").collect()
    assert(out.map(_.getAs[Int]("label_id")).toSeq == Seq(2, 0, 1, 0))
    val oh = out.head.getAs[scala.collection.Seq[Float]]("onehot")
    assert(oh == Seq(0.0f, 0.0f, 1.0f)) // carrot -> id 2 of 3 classes
    val empty = Pipes.labeler(df.filter(lit(false)), "lbl")
    assert(empty.count() == 0)          // no labels.head crash
  }

  test("stratifiedSampleByHash keeps ceil(f*n) per class, invariant under repartitioning") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, s"c${i % 3}")).toDF("k", "cls")
    val a = graft.prep.Preprocessing
      .stratifiedSampleByHash(df, "cls", Seq("k"), 0.2, "s1")
    val counts = a.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSet == Set(20L)) // ceil(0.2 * 100) per class
    val b = graft.prep.Preprocessing
      .stratifiedSampleByHash(df.repartition(13), "cls", Seq("k"), 0.2, "s1")
    assert(a.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      b.select("k").collect().map(_.getLong(0)).sorted.toSeq) // same rows chosen
  }

  test("charTokens (T1 character_tokenizer) splits into single characters, incl. multi-byte") {
    import spark.implicits._
    val out = Seq("abc", "héé", "").toDF("t")
      .select(graft.functions.TextFunctions.charTokens(col("t")).as("c"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a", "b", "c"))
    assert(out(1) == Seq("h", "é", "é"), "multi-byte chars stay whole")
    assert(out(2).filter(_.nonEmpty).isEmpty, "empty text yields no characters")
  }

  test("padToMax on an empty frame returns it unchanged (max over zero rows is null)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[String])].toDF("id", "toks")
    val out = graft.functions.TextFunctions.padToMax(empty, "toks", "<pad>")
    assert(out.count() == 0)
  }

  test("resampleForwardFill equals a driver-side model on random timestamps spanning the epoch (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1312)
    val stepSec = 90L // non-round step: exercises div/pmod interplay
    val rows = Seq.tabulate(300) { i =>
      // millis in [-6e6, 6e6): both signs, sub-bucket offsets included
      val ms = (rnd.nextLong() % 6000000L)
      (new java.sql.Timestamp(ms), s"k${i % 3}", rnd.nextInt(1000).toDouble)
    }
    val out = graft.streaming.StreamOps
      .resampleForwardFill(rows.toDF("ts", "key", "v"), "ts", "key", "v", stepSec)
      .select("key", "bts", "v", "was_gap")
      .as[(String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // driver-side model: floored bucket -> per-bucket max -> dense
    // per-key grid -> forward fill, gap where the bucket was absent
    val want = rows.groupBy(_._2).flatMap { case (key, rs) =>
      val byB = rs.groupBy { case (ts, _, _) =>
        Math.floorDiv(ts.getTime * 1000L, stepSec * 1000000L) * stepSec
      }.map { case (b, grp) => b -> grp.map(_._3).max }
      var carry = 0.0
      (byB.keys.min to byB.keys.max by stepSec).map { b =>
        val present = byB.contains(b)
        if (present) carry = byB(b)
        (key, b) -> (carry, if (present) 0 else 1)
      }
    }
    assert(out.size == want.size, s"grid sizes: got ${out.size}, want ${want.size}")
    for ((k, v) <- want) assert(out(k) == v, s"cell $k: got ${out.get(k)}, want $v")
  }

  test("resampleForwardFill floors pre-epoch timestamps into the correct grid cell") {
    import spark.implicits._
    // -30 s with a 60 s grid belongs to bucket -60, not 0 (div would
    // truncate toward zero and merge it into the epoch bucket)
    val df = Seq(
      (new java.sql.Timestamp(-30000L), "k", 1.0),
      (new java.sql.Timestamp(65000L), "k", 2.0)
    ).toDF("ts", "key", "v")
    val out = graft.streaming.StreamOps.resampleForwardFill(df, "ts", "key", "v", 60L)
      .select("bts", "v").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.keySet == Set(-60L, 0L, 60L), s"grid: ${out.keySet}")
    assert(out(-60L) == 1.0 && out(0L) == 1.0 && out(60L) == 2.0,
      "pre-epoch event anchors its own bucket; epoch bucket forward-fills")
  }
}
