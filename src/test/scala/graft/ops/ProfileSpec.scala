package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Table profiler: null accounting, native-type min/max, exact vs
  * approx distinct paths. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (Some(10L), Some("b")), (Some(2L), None),
    (Some(10L), Some("a")), (None, Some("a"))
  ).toDF("k", "s")

  test("profile: per-column rows/nulls/distincts and typed min/max") {
    val out = Relational.profile(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    // min/max computed in the NATIVE type then cast: numeric min is
    // 2, not lexicographic "10"
    assert(out("k") == ((4L, 1L, 2L, "2", "10")))
    assert(out("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profile: approx path agrees on small cardinalities and never " +
    "expands the input") {
    val exact = Relational.profile(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Relational.profile(docs, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact == approx) // HLL is exact at tiny cardinality
    // the scale property: the approx plan has no Expand (the exact
    // multi-distinct plan pays one input duplication per column)
    val plan = Relational.profile(docs, exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(2000))
  }

  private def hist(vals: Seq[java.lang.Long], nb: Int) =
    Relational.histogramExact(vals.toDF("v"), "v", nb)
      .select("bucket", "n", "lo", "hi")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("histogram: uniform 0..9 into 5 equal buckets") {
    val m = hist((0L to 9L).map(Long.box), 5)
    assert(m == Map(0L -> ((2L, 0L, 1L)), 1L -> ((2L, 2L, 3L)),
      2L -> ((2L, 4L, 5L)), 3L -> ((2L, 6L, 7L)),
      4L -> ((2L, 8L, 9L))))
  }

  test("histogram: max lands in the last bucket, no clamp artifacts") {
    val m = hist(Seq(0L, 99L).map(Long.box), 10)
    assert(m == Map(0L -> ((1L, 0L, 0L)), 9L -> ((1L, 99L, 99L))))
  }

  test("histogram: single-value domain collapses to bucket 0") {
    val m = hist(Seq(7L, 7L, 7L).map(Long.box), 20)
    assert(m == Map(0L -> ((3L, 7L, 7L))))
  }

  test("histogram: nulls excluded from every bucket") {
    val m = hist(Seq(Long.box(1L), null, Long.box(2L)), 2)
    assert(m.values.map(_._1).sum == 2L)
  }

  private def pcts(vals: Seq[Long], ps: (String, Int, Int)*) =
    Relational.exactPercentiles(vals.toDF("v"), "v", ps.toSeq)
      .select("p", "rank", "value")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("exact percentiles: type-1 ranks on 1..10") {
    val m = pcts(1L to 10L,
      ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20))
    // rank = ceil(p·10): 3, 5, 8, 10 → value = rank on 1..10
    assert(m == Map("p25" -> ((3L, 3L)), "p50" -> ((5L, 5L)),
      "p75" -> ((8L, 8L)), "p95" -> ((10L, 10L))))
  }

  test("exact percentiles: duplicates collapse to histogram entries") {
    val m = pcts(Seq(1L, 1L, 1L, 9L), ("p50", 1, 2), ("p95", 19, 20))
    // N=4: p50 rank 2 → 1 (inside the triple), p95 rank 4 → 9
    assert(m == Map("p50" -> ((2L, 1L)), "p95" -> ((4L, 9L))))
  }

  test("exact percentiles: p100 is the max, single value is itself") {
    assert(pcts(Seq(5L, 7L, 7L), ("p100", 1, 1)) ==
      Map("p100" -> ((3L, 7L))))
    assert(pcts(Seq(42L), ("p50", 1, 2)) == Map("p50" -> ((1L, 42L))))
  }

  test("exact percentiles: cardinality misuse guard fires in-plan") {
    // a continuous-ish column (all values distinct) past maxDistinct
    // must fail LOUDLY — the global histogram form's single-partition
    // cumsum is only bounded when the column is low-cardinality
    val e = intercept[Exception] {
      Relational.exactPercentiles((1L to 50L).toDF("v"), "v",
          Seq(("p50", 1, 2)), maxDistinct = 10)
        .collect()
    }
    assert(e.getMessage.contains("exactPercentiles") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("exactPercentiles"))
    // and the same data under the bound still answers exactly
    assert(pcts(1L to 50L, ("p50", 1, 2)) == Map("p50" -> ((25L, 25L))))
  }

  test("grouped percentiles: per-group type-1 ranks, groups independent") {
    val df = ((1L to 10L).map(v => ("a", v)) ++ Seq(("b", 100L)))
      .toDF("grp", "v")
    val m = Relational.groupedPercentiles(df, "grp", "v",
        Seq(("p50", 1, 2), ("p95", 19, 20)))
      .select("grp", "p", "rank", "value")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(m == Map(
      ("a", "p50") -> ((5L, 5L)), ("a", "p95") -> ((10L, 10L)),
      ("b", "p50") -> ((1L, 100L)), ("b", "p95") -> ((1L, 100L))))
  }

  private def mad(rows: Seq[(String, Long)],
      kNum: Long = 5189, kDen: Long = 1000) =
    Relational.madOutliers(rows.toDF("grp", "v"), "grp", "v",
        kNum, kDen)
      .select("grp", "n", "median", "mad", "n_outliers",
        "outlier_share")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("mad outliers: hand case — one gross outlier flagged, the " +
    "rest not; mean-based z would have been dragged") {
    // group a: 1..9 plus 1000. median of 10 values (type-1, rank 5)
    // = 5; |v-5| = {4,3,2,1,0,1,2,3,4,995}, MAD (rank 5) = 2.
    // threshold 5189*2/1000 = 10.378: only 995 exceeds it.
    val m = mad((1L to 9L).map(("a", _)) :+ (("a", 1000L)))
    assert(m("a") == ((10L, 5L, 2L, 1L, 0.1)))
  }

  test("mad outliers: degenerate MAD=0 flags every off-median value") {
    // 3 of 4 values on the median → MAD 0; the single 7 is flagged
    val m = mad(Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 7L)))
    assert(m("a") == ((4L, 5L, 0L, 1L, 0.25)))
  }

  test("mad outliers: groups are independent; constant group clean") {
    val m = mad(((1L to 9L).map(("a", _)) :+ (("a", 1000L))) ++
      Seq(("b", 3L), ("b", 3L), ("b", 3L)))
    assert(m("a")._4 == 1L)
    // constant group: every adev 0, MAD 0, nothing off-median
    assert(m("b") == ((3L, 3L, 0L, 0L, 0.0)))
  }

  test("mad outliers: threshold is an exact rational compare " +
    "(boundary value NOT flagged at equality)") {
    // values {0,0,0,0,10}: median 0, adevs {0,0,0,0,10}, MAD 0 →
    // 10 flagged. Now k = 1/1 on {1,2,3,4,5}: median 3, adevs
    // {2,1,0,1,2}, MAD 1; rule kDen*adev > kNum*mad → adev > 1:
    // exactly the two 2s — adev == 1 (equality) is NOT flagged.
    val m = mad(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("a", 5L)), kNum = 1, kDen = 1)
    assert(m("a") == ((5L, 3L, 1L, 2L, 0.4)))
  }

  test("fused profile: reserved-scope sentinel guard fires when a " +
    "group value equals __ALL__; clean data is unaffected") {
    val bad = Seq(("__ALL__", 1L), ("g2", 2L)).toDF("g", "v")
    val e = intercept[Exception] {
      Relational.profilePercentiles(bad, "g", "v",
        Seq(("p50", 1, 2))).collect()
    }
    assert(e.getMessage.contains("__ALL__") ||
      e.getCause != null && e.getCause.getMessage.contains("__ALL__"))
    val ok = Seq(("a", 1L), ("a", 3L), ("b", 2L)).toDF("g", "v")
    val rows = Relational.profilePercentiles(ok, "g", "v",
      Seq(("p50", 1, 2))).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rows == Map("a" -> 1L, "b" -> 2L, "__ALL__" -> 2L))
  }
}
