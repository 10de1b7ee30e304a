package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Incremental aggregate maintenance: merging partials must equal the
  * full recompute, for any batch split, including degenerate ones. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partial(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(
      sum(col("v").cast("decimal(18,2)")).as("sum_v"),
      count(lit(1)).as("n"))

  test("mergeGroupedAgg over 3 batches == full recompute") {
    val rows = (1 to 300).map(i => (s"k${i % 7}", i * 0.01))
    val full = partial(rows.toDF("k", "v"))
      .collect().map(_.toSeq).toSet
    val batches = rows.grouped(100)
      .map(b => partial(b.toDF("k", "v"))).toSeq
    val merged = ScaleOps.mergeGroupedAgg(batches, Seq("k"),
        Seq("sum_v"), "n")
      // merge widens the decimal (sum of decimal(28,2) partials);
      // normalize back for the comparison
      .select(col("k"), col("sum_v").cast("decimal(28,2)").as("sum_v"),
        col("n"))
    assert(merged.collect().map(_.toSeq).toSet == full)
  }

  test("merging an empty delta is a no-op") {
    val base = partial(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    val emptyDelta = partial(
      Seq.empty[(String, Double)].toDF("k", "v"))
    val merged = ScaleOps.mergeGroupedAgg(Seq(base, emptyDelta),
        Seq("k"), Seq("sum_v"), "n")
      .select(col("k"), col("sum_v").cast("decimal(28,2)").as("sum_v"),
        col("n"))
    assert(merged.collect().map(_.toSeq).toSet ==
      base.collect().map(_.toSeq).toSet)
  }

  test("merge keeps keys that exist in only one batch") {
    val b1 = partial(Seq(("only1", 5.0)).toDF("k", "v"))
    val b2 = partial(Seq(("only2", 7.0)).toDF("k", "v"))
    val merged = ScaleOps.mergeGroupedAgg(Seq(b1, b2), Seq("k"),
      Seq("sum_v"), "n")
    assert(merged.select("k").as[String].collect().toSet ==
      Set("only1", "only2"))
  }

  test("histogramQuantiles: within one bin width of the ceil(p*n)-th " +
    "order statistic on the events fixture, for every group and probe") {
    val events = graft.Tables.t(spark, TestSpark.sf0001, "events")
    val bins = 256
    val probs = Seq(0.25, 0.5, 0.75, 0.99)
    val est = ScaleOps.histogramQuantiles(events, Seq("event_type"),
        "value", probs, bins)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getDouble(2)).toMap
    val groups = events.filter(col("value").isNotNull)
      .select("event_type", "value")
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(groups.nonEmpty)
    groups.foreach { case (k, vs) =>
      val w = (vs.last - vs.head) / bins
      probs.foreach { p =>
        val orderStat = vs(math.ceil(p * vs.length).toInt - 1)
        val e = est((k, p))
        assert(math.abs(e - orderStat) <= w + 1e-9,
          s"$k p=$p: est $e vs order stat $orderStat " +
            s"exceeds bin width $w")
      }
    }
  }

  test("histogramQuantiles: degenerate constant group returns the " +
    "constant; p=1 lands within a bin width of the max") {
    val df = (Seq.fill(50)(("const", 7.5)) ++
      (1 to 200).map(i => ("ramp", i * 0.5))).toDF("k", "v")
    val out = ScaleOps.histogramQuantiles(df, Seq("k"), "v",
        Seq(0.5, 1.0), bins = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getDouble(2)).toMap
    assert(out(("const", 0.5)) == 7.5 && out(("const", 1.0)) == 7.5)
    val w = (100.0 - 0.5) / 64
    assert(math.abs(out(("ramp", 1.0)) - 100.0) <= w + 1e-9)
    assert(math.abs(out(("ramp", 0.5)) - 50.25) <= w + 1e-9)
  }

  test("groupTrend: exact line recovered, degenerate group NULLs, " +
    "moments exact") {
    val df = Seq(
      ("a", 0L, 1.0), ("a", 1L, 3.0), ("a", 2L, 5.0), // y = 1 + 2x
      ("b", 7L, 4.0), ("b", 7L, 9.0),                 // all x equal
      ("c", 0L, 2.5), ("c", 4L, 2.5)                  // flat line
    ).toDF("k", "x", "y")
    val out = ScaleOps.groupTrend(df, Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a") // (k, n, sx, sy, sxy, sxx, syy, slope, b0, corr)
    assert(a.getLong(1) == 3 && a.getDouble(2) == 3.0 &&
      a.getDouble(3) == 9.0 && a.getDouble(4) == 13.0 &&
      a.getDouble(5) == 5.0 && a.getDouble(6) == 35.0)
    assert(a.getDouble(7) == 2.0 && a.getDouble(8) == 1.0)
    assert(a.getDouble(9) == 1.0) // exact line -> corr exactly 1
    assert(out("b").isNullAt(7) && out("b").isNullAt(8) &&
      out("b").isNullAt(9))
    assert(out("c").getDouble(7) == 0.0 &&
      out("c").getDouble(8) == 2.5)
    assert(out("c").isNullAt(9)) // constant y -> corr NULL, never 0/0
  }

  test("zorderKey: bit interleave matches a driver-side Morton code " +
    "on hand pairs and 200 random 32-bit pairs") {
    def morton(a: Long, b: Long): Long =
      (0 until 32).foldLeft(0L) { (z, i) =>
        z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }
    val rnd = new scala.util.Random(5)
    val pairs = Seq((3L, 5L), (0L, 0L), (0xFFFFFFFFL, 0L),
      (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL)) ++
      Seq.fill(200)((rnd.nextLong() & 0xFFFFFFFFL,
        rnd.nextLong() & 0xFFFFFFFFL))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        ScaleOps.zorderKey(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == pairs.length)
    got.foreach { case (a, b, z) =>
      assert(z == morton(a, b), s"($a,$b): got $z want ${morton(a, b)}")
    }
    assert(got.find(g => (g._1, g._2) == ((3L, 5L))).get._3 == 39L)
  }

  test("a13 HLL distinct: within the rsd bound of exact, " +
    "deterministic across runs, and mergeable (union == re-sketch)") {
    import org.apache.spark.sql.functions._
    val d = graft.TestSpark.sf0001
    val li = graft.Tables.t(spark, d, "lineitem")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02)
          .as("approx_distinct"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sketch(li)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) <= math.max(0.10 * exact(k), 5),
        s"group $k: sketch $v vs exact ${exact(k)}")
    }
    assert(sketch(li) == got, "sketch must be deterministic")
    // mergeability: sketching two halves and the whole agree — the
    // partial-agg path IS a merge of per-partition sketches, so a
    // split corpus re-partitioned arbitrarily must not move estimates
    assert(sketch(li.repartition(17)) == got,
      "estimate must be partitioning-invariant (mergeable sketch)")
  }
}
