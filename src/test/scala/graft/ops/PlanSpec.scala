package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Physical-plan quality gates (SURVEY §4): these are the properties
  * that make the engine viable at 100 TB, asserted so a refactor that
  * silently loses pushdown/broadcast/pruning fails CI, not production.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf001

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, d)
      .queryExecution.executedPlan.toString

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("predicate pushdown reaches the parquet scan") {
    val p = plan("f_filter_pushdown")
    // (the PushedFilters list is elided with "..." in toString — assert
    // on the visible prefix)
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)"),
      p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_discount"))
  }

  test("column pruning: a1 scan reads only the 6 needed lineitem cols") {
    val p = plan("a1_grouped_sum")
    assert(!p.contains("l_partkey"))
    assert(!p.contains("l_suppkey"))
    assert(p.contains("l_returnflag"))
  }

  test("dimension joins are broadcast-hash, not shuffle") {
    assert(plan("j1_left_join").contains("BroadcastHashJoin"))
    val star = plan("j2_star_join")
    // customer/nation/region all broadcast; only lineitem⨝orders may
    // shuffle.
    assert(countOf(star, "BroadcastHashJoin") >= 3)
  }

  test("semi/anti joins planned as such") {
    assert(plan("j4_semi_join").contains("LeftSemi"))
    assert(plan("j5_anti_join").contains("LeftAnti"))
  }

  test("tpm pipeline: ≤2 hash-partition shuffles + broadcast dim") {
    val p = plan("g_tpm")
    assert(p.contains("BroadcastExchange"), "part dim must broadcast")
    assert(countOf(p, "Exchange hashpartitioning") <= 2,
      s"unexpected extra shuffles:\n${p.take(3000)}")
  }

  test("whole-stage codegen covers the scan→aggregate path") {
    // Under AQE the unexecuted adaptive plan reports no codegen
    // subtrees — toggle AQE off for the inspection only.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cg = graft.SparkEntry.queries("a1_grouped_sum")(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
      assert(cg.contains("WholeStageCodegen subtrees"), cg.take(500))
      assert(!cg.contains("Found 0 WholeStageCodegen"), cg.take(500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("primer scoring: one broadcast join, no window over alignments") {
    // Primers.scoreMatches folds the primer dim to a per-model array
    // and picks matches with per-row lambdas: exactly one broadcast
    // join and NO window/sort over the alignment table
    val p = plan("g_primer_match")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("Window"), s"unexpected window:\n${p.take(2000)}")
  }

  test("langid profile join is broadcast") {
    assert(plan("tx_langid").contains("BroadcastHashJoin"))
  }

  test("no CartesianProduct outside the sanctioned baselines") {
    // x_ann_brute is the declared broadcast-small brute-force baseline
    // (lshTopK is the scale path); j8_cross_grid IS the cross operator
    val sanctioned = Set("x_ann_brute", "j8_cross_grid")
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(sanctioned)
      .filter { name =>
        val p = plan(name)
        p.contains("CartesianProduct")
      }
    assert(offenders.isEmpty,
      s"unsanctioned cartesian products in: $offenders")
  }

  test("line parsers are narrow: no exchange in seqkit/tblout parse") {
    assert(!plan("s7_seqkit_stats").contains("Exchange"))
    assert(!plan("s6_tblout_parse").contains("Exchange"))
  }

  test("split assign is pure per-row: zero exchanges") {
    assert(!plan("tx_split_assign").contains("Exchange"))
  }

  test("pack bins: one window shuffle + one aggregation shuffle max") {
    val p = plan("tx_pack_bins")
    assert(countOf(p, "Exchange hashpartitioning") <= 2,
      s"packing re-shuffles:\n${p.take(3000)}")
  }

  test("corpus curate: dedup+quality+langid+split in ≤4 shuffles, " +
    "profile broadcast") {
    val p = plan("tx_corpus_curate")
    assert(p.contains("BroadcastHashJoin"))
    // the four: dedup window on the digest, langid hit-agg, langid
    // argmax window, re-key of the curated side for the final join
    assert(countOf(p, "Exchange hashpartitioning") <= 4,
      s"curation pipeline re-shuffles:\n${p.take(3000)}")
  }

  test("asof join: exactly one data shuffle (the union window)") {
    // the whole point of the union reformulation: both sides shuffle
    // ONCE on the key for the window; no join exchange, no cross
    // product appears anywhere
    val p = plan("j_asof_click")
    assert(countOf(p, "Exchange hashpartitioning") <= 1,
      s"asof join re-shuffles:\n${p.take(3000)}")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("repetition signals are pure per-row: zero exchanges") {
    assert(!plan("tx_repetition").contains("Exchange"))
  }

  test("range-frame window: one shuffle, no self-join") {
    val p = plan("w8_range_frame")
    assert(countOf(p, "Exchange hashpartitioning") <= 1,
      s"range frame re-shuffles:\n${p.take(3000)}")
    assert(!p.contains("Join"),
      s"range frame planned as a join:\n${p.take(3000)}")
  }

  test("anvio cascade reuses one partitioning for its window stack") {
    // All five window stages partition by l_orderkey (or a superset
    // that starts with it) — at most 2 hash shuffles may appear
    // (orderkey+partkey stage, then orderkey stages).
    val p = plan("w3_anvio_cascade")
    assert(countOf(p, "Exchange hashpartitioning") <= 2,
      s"window stack re-shuffles:\n${p.take(3000)}")
  }
}
