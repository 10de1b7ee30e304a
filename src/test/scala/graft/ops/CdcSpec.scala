package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Snapshot diff semantics: add/remove/changed classification,
  * per-column change lists, null-safe comparison, unchanged rows
  * dropped. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val base = Seq(
    (1L, Some("a"), Some(10.0)), // unchanged
    (2L, Some("b"), Some(20.0)), // price changes
    (3L, Some("c"), Some(30.0)), // removed
    (4L, None: Option[String], Some(40.0)), // name null -> value
    (5L, Some("e"), Some(50.0)) // both columns change
  ).toDF("k", "name", "price")

  private lazy val curr = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), Some(21.0)),
    (4L, Some("d"), Some(40.0)),
    (5L, Some("E"), Some(55.0)),
    (6L, Some("f"), Some(60.0)) // added
  ).toDF("k", "name", "price")

  private lazy val out =
    Cdc.snapshotDiff(base, curr, Seq("k")).cache()

  test("classification: added/removed/changed, unchanged dropped") {
    val m = out.select("k", "change").as[(Long, String)].collect().toMap
    assert(m == Map(2L -> "changed", 3L -> "removed", 4L -> "changed",
      5L -> "changed", 6L -> "added"))
  }

  test("changed_cols lists exactly the differing columns, base order") {
    val m = out.filter(col("change") === "changed")
      .select("k", "changed_cols").as[(Long, String)].collect().toMap
    assert(m == Map(2L -> "price", 4L -> "name", 5L -> "name,price"))
  }

  test("changed_cols is null for adds and removes") {
    assert(out.filter(col("change").isin("added", "removed"))
      .filter(col("changed_cols").isNotNull).count() == 0)
  }

  test("before/after rows ride along for value consumers") {
    val r = out.filter(col("k") === 2)
      .select(col("b_row.price"), col("c_row.price"))
      .as[(Double, Double)].head()
    assert(r == ((20.0, 21.0)))
  }

  test("null-to-null column is not a change") {
    val b = Seq((1L, None: Option[String])).toDF("k", "v")
    val c = Seq((1L, None: Option[String])).toDF("k", "v")
    assert(Cdc.snapshotDiff(b, c, Seq("k")).count() == 0)
  }

  test("applyDiff round-trips: apply(base, diff(base, curr)) == curr") {
    val applied = Cdc.applyDiff(base, out, Seq("k"))
    assert(applied.exceptAll(curr).count() == 0)
    assert(curr.exceptAll(applied).count() == 0)
  }

  test("applyDiff unit semantics: insert, drop, column merge") {
    val applied = Cdc.applyDiff(base, out, Seq("k")).cache()
    assert(applied.filter(col("k") === 3).count() == 0) // removed
    assert(applied.filter(col("k") === 6)
      .select("name").as[String].head() == "f") // added
    assert(applied.filter(col("k") === 2)
      .select("price").as[Double].head() == 21.0) // merged change
    assert(applied.filter(col("k") === 1)
      .select("price").as[Double].head() == 10.0) // untouched kept
    applied.unpersist()
  }

  test("applyDiff of an EMPTY diff is the identity") {
    val empty = Cdc.snapshotDiff(base, base, Seq("k"))
    val applied = Cdc.applyDiff(base, empty, Seq("k"))
    assert(applied.exceptAll(base).count() == 0)
    assert(base.exceptAll(applied).count() == 0)
  }

  test("gate round-trip at sf0.001: cdc_apply == the curr snapshot") {
    val applied = graft.SparkEntry.queries("cdc_apply")(
      spark, "/root/testdata/sf0.001")
    val orders = graft.Tables.t(spark, "/root/testdata/sf0.001",
      "orders")
    val curr = orders.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 31 === 0, lit("9-RUSH"))
          .otherwise(col("o_orderpriority")))
    assert(applied.exceptAll(curr).count() == 0)
    assert(curr.exceptAll(applied).count() == 0)
  }

  test("scd2: the history's open slice IS the current snapshot") {
    val hist = Cdc.scd2Apply(Cdc.scd2Init(base, 0L), out, Seq("k"), 1L)
    val open = hist.filter(col("is_current"))
      .select("k", "name", "price")
    assert(open.exceptAll(curr).count() == 0)
    assert(curr.exceptAll(open).count() == 0)
  }

  test("scd2: version timelines per change class") {
    val hist = Cdc.scd2Apply(Cdc.scd2Init(base, 0L), out, Seq("k"), 1L)
      .cache()
    // unchanged key: one open version from batch 0
    val k1 = hist.filter(col("k") === 1)
      .select("valid_from", "valid_to", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(k1 == Seq((0L, None, true)))
    // changed key: closed batch-0 version + open batch-1 version
    val k2 = hist.filter(col("k") === 2)
      .select("price", "valid_from", "valid_to", "is_current")
      .as[(Double, Long, Option[Long], Boolean)].collect().toSet
    assert(k2 == Set((20.0, 0L, Some(1L), false), (21.0, 1L, None, true)))
    // removed key: closed version only, no open row
    val k3 = hist.filter(col("k") === 3)
      .select("valid_from", "valid_to", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(k3 == Seq((0L, Some(1L), false)))
    // added key: one open batch-1 version
    val k6 = hist.filter(col("k") === 6)
      .select("valid_from", "valid_to", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(k6 == Seq((1L, None, true)))
    hist.unpersist()
  }

  test("scd2: a second advance keeps closed versions untouched") {
    val h1 = Cdc.scd2Apply(Cdc.scd2Init(base, 0L), out, Seq("k"), 1L)
    val curr2 = curr.withColumn("price",
      when(col("k") === 2, 22.0).otherwise(col("price")))
    val h2 = Cdc.scd2Apply(h1, Cdc.snapshotDiff(curr, curr2, Seq("k")),
      Seq("k"), 2L).cache()
    // k=2 now has THREE versions: (20, 0→1), (21, 1→2), (22, 2→open)
    val k2 = h2.filter(col("k") === 2)
      .select("price", "valid_from", "valid_to", "is_current")
      .as[(Double, Long, Option[Long], Boolean)].collect().toSet
    assert(k2 == Set((20.0, 0L, Some(1L), false),
      (21.0, 1L, Some(2L), false), (22.0, 2L, None, true)))
    // and the open slice is curr2
    val open = h2.filter(col("is_current")).select("k", "name", "price")
    assert(open.exceptAll(curr2).count() == 0)
    assert(curr2.exceptAll(open).count() == 0)
    h2.unpersist()
  }

  test("scd2AsOf: time travel recovers every absorbed snapshot") {
    val h1 = Cdc.scd2Apply(Cdc.scd2Init(base, 0L), out, Seq("k"), 1L)
    val curr2 = curr.withColumn("price",
      when(col("k") === 2, 22.0).otherwise(col("price")))
    val h2 = Cdc.scd2Apply(h1, Cdc.snapshotDiff(curr, curr2, Seq("k")),
      Seq("k"), 2L).cache()
    Seq(0L -> base, 1L -> curr, 2L -> curr2).foreach {
      case (k, snap) =>
        val asOf = Cdc.scd2AsOf(h2, k)
        assert(asOf.exceptAll(snap).count() == 0, s"asOf($k) extra rows")
        assert(snap.exceptAll(asOf).count() == 0, s"asOf($k) lost rows")
    }
    h2.unpersist()
  }

  test("upsertBatch: a vanished initialized state fails loudly; a " +
    "crashed staged swap is recovered and the merge continues") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ub")
    val state = dir.resolve("state").toString
    def batch(rows: (Long, Double, String, Long)*) =
      rows.toSeq.toDF("key", "payload", "op", "seq")
    Cdc.upsertBatch(spark, batch((1L, 1.0, "U", 1L), (2L, 2.0, "U", 2L)),
      state)
    assert(spark.read.parquet(state).count() == 2)
    // crash window: the live generation sits at .retired, no target —
    // the next batch must recover it and merge on top, not rebuild
    assert(new java.io.File(state).renameTo(
      new java.io.File(state + ".retired")))
    Cdc.upsertBatch(spark, batch((3L, 3.0, "U", 3L)), state)
    assert(spark.read.parquet(state).select("key")
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
    // state initialized but UNRECOVERABLY missing: refuse to treat it
    // as empty (a silent rebuild would drop keys 1..3)
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete()
    }
    rmrf(new java.io.File(state))
    intercept[IllegalArgumentException] {
      Cdc.upsertBatch(spark, batch((4L, 4.0, "U", 4L)), state)
    }
  }

  test("gate: every change class present at sf0.001") {
    val g = graft.SparkEntry.queries("cdc_snapshot_diff")(
      spark, "/root/testdata/sf0.001")
    val classes = g.select("change").distinct()
      .as[String].collect().toSet
    assert(classes == Set("added", "removed", "changed"))
    // two-column changes exist (keys divisible by 13 and 31)
    assert(g.filter(col("changed_cols") ===
      "o_totalprice,o_orderpriority").count() > 0)
  }
}
