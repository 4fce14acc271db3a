package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Fixture-drift tripwire: the driver regenerates /root/testdata between
  * rounds, and round 8 shipped 12 broken queries because events.ts silently
  * changed parquet type (TIMESTAMP(NANOS) → timestamp[us]) and nothing
  * re-checked the fixtures against the adapters. This spec reads ONLY
  * parquet footers (schema, no data) for every table at every present
  * scale factor and pins the column names plus the types the query suite
  * depends on, so the next drift fails `sbt test` loudly instead of
  * surfacing as a shrunk correctness artifact.
  */
class TestdataDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).exists())

  // If the testdata mount vanishes entirely, every per-table test below
  // would vacuously pass — fail loudly instead of going silently green.
  test("at least one testdata scale dir is present") {
    assert(sfDirs.nonEmpty,
      "no /root/testdata/sf* directory found — fixture mount missing, drift checks are vacuous")
  }

  // Several queries plant synthetic docs by re-keying doc_id + OFFSET
  // (d1/d14: +10000, d13: +50000, x39: +100000) and their oracles
  // classify by the same literal thresholds. That is only sound while
  // real ids stay BELOW the smallest offset — pin it so a regenerated
  // bigger fixture fails here instead of as a baffling oracle drift.
  test("doc_id space stays below the smallest re-key offset (10000)") {
    sfDirs.foreach { d =>
      val mx = spark.read.parquet(s"$d/documents.parquet")
        .agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0)
      assert(mx < 10000L,
        s"$d: max doc_id $mx >= 10000 — the d1/d13/d14/x39 re-key offsets collide")
    }
  }

  // x40's bit-for-bit quantile_cont oracle match relies on every
  // per-nation customer group staying under the 16384 sketch capacity
  // (the KLL EXACT regime). A regenerated bigger fixture (sf10 has
  // ~60k customers/nation) would otherwise surface as baffling oracle
  // drift — pin the invariant so it fails HERE with a name instead.
  // (x40b is immune: it gates the estimation regime by design, and
  // s11's vec_id+10000 batch offset is pinned the same way below.)
  test("per-nation customer counts stay under the x40 sketch capacity (16384)") {
    sfDirs.foreach { d =>
      val mx = spark.read.parquet(s"$d/customer.parquet")
        .groupBy("c_nationkey").count()
        .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
      assert(mx < 16384L,
        s"$d: largest per-nation customer group $mx >= 16384 — x40 leaves the exact regime; raise its k or re-gate")
    }
  }

  // s11 plants a clone batch at vec_id + 10000; its oracle classifies
  // by the same literal. Sound only while real vec_ids stay below it.
  test("vec_id space stays below the s11 re-key offset (10000)") {
    sfDirs.foreach { d =>
      val mx = spark.read.parquet(s"$d/embeddings.parquet")
        .agg(org.apache.spark.sql.functions.max("vec_id")).head().getLong(0)
      assert(mx < 10000L,
        s"$d: max vec_id $mx >= 10000 — the s11 clone-batch offset collides")
    }
  }

  // Column name → required Spark type (post-raw-load, pre-adapter) for the
  // columns queries actually touch. Types we don't depend on pin name only.
  private val pinned: Map[String, Seq[(String, Option[DataType])]] = Map(
    "region"   -> Seq("r_regionkey" -> None, "r_name" -> Some(StringType)),
    "nation"   -> Seq("n_nationkey" -> None, "n_name" -> Some(StringType), "n_regionkey" -> None),
    "customer" -> Seq("c_custkey" -> None, "c_nationkey" -> None, "c_acctbal" -> Some(DoubleType)),
    "supplier" -> Seq("s_suppkey" -> None, "s_nationkey" -> None),
    "part"     -> Seq("p_partkey" -> None, "p_type" -> Some(StringType)),
    "orders"   -> Seq("o_orderkey" -> None, "o_custkey" -> None,
      "o_totalprice" -> Some(DoubleType), "o_orderdate" -> Some(TimestampNTZType),
      "o_orderpriority" -> Some(StringType)),
    "lineitem" -> Seq("l_orderkey" -> None, "l_partkey" -> None, "l_suppkey" -> None,
      "l_quantity" -> Some(DoubleType), "l_extendedprice" -> Some(DoubleType),
      "l_discount" -> Some(DoubleType), "l_returnflag" -> Some(StringType),
      "l_shipdate" -> Some(TimestampNTZType)),
    "events"   -> Seq("event_id" -> Some(LongType), "ts" -> None,
      "user_id" -> Some(LongType), "event_type" -> Some(StringType),
      "value" -> Some(DoubleType), "props" -> Some(StringType)),
    "documents"  -> Seq("doc_id" -> None, "text" -> Some(StringType),
      "lang" -> Some(StringType), "source" -> Some(StringType)),
    "embeddings" -> Seq("vec_id" -> None,
      "embedding" -> Some(ArrayType(FloatType, containsNull = true)), "label" -> None)
  )

  // The tripwire must itself be tripwired: if the fixture root is
  // missing or relocated, sfDirs is empty and every generated test
  // above silently vanishes — the exact failure mode this spec was
  // built to prevent (ADVICE r9).
  test("fixture root present: /root/testdata has at least sf0.001") {
    assert(sfDirs.nonEmpty,
      "/root/testdata has no sf* fixture directories — drift tripwire is blind")
    assert(sfDirs.exists(_.endsWith("sf0.001")),
      s"sf0.001 fixture missing; present: ${sfDirs.mkString(",")}")
  }

  for (dir <- sfDirs; (tbl, cols) <- pinned.toSeq.sortBy(_._1)) {
    test(s"$dir/$tbl.parquet carries the pinned columns/types") {
      val schema = spark.read.parquet(s"$dir/$tbl.parquet").schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      for ((name, wantType) <- cols) {
        assert(byName.contains(name), s"$tbl missing column $name; has ${schema.fieldNames.mkString(",")}")
        wantType.foreach { t =>
          assert(byName(name) == t, s"$tbl.$name drifted: expected $t, fixture has ${byName(name)}")
        }
      }
    }
  }

  // events.ts has two sanctioned on-disk encodings; the ADAPTER must
  // normalize both to session-zoned TimestampType. Pin the adapter's
  // OUTPUT, not one encoding — this is the exact contract the 12
  // round-8 failures violated.
  for (dir <- sfDirs) {
    test(s"Tables.events($dir) normalizes ts to TimestampType regardless of fixture encoding") {
      val raw = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      assert(raw == TimestampNTZType || raw == TimestampType || raw == LongType,
        s"events.ts fixture type $raw is outside every encoding the adapter handles — update Tables.events")
      val adapted = Tables.events(spark, dir).schema("ts").dataType
      assert(adapted == TimestampType, s"adapter produced $adapted, queries need TimestampType")
    }
  }
}
