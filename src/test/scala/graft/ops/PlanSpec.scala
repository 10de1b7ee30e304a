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

  test("pii scrub is pure per-row: zero exchanges") {
    assert(!plan("tx_pii_scrub").contains("Exchange"))
  }

  test("dup-ngram fraction: df side combines map-side and broadcasts " +
    "— the exploded corpus side never shuffles for the gram join") {
    val p = plan("tx_dup_ngram_frac")
    assert(p.contains("BroadcastHashJoin"),
      s"gram join not broadcast at gate scale:\n${p.take(3000)}")
    // only two hash shuffles: the df-count aggregate (post partial
    // combine) and the doc-keyed aggregate
    assert(countOf(p, "Exchange hashpartitioning") <= 2,
      s"extra shuffles:\n${p.take(3000)}")
  }

  test("passage dedup: no passage-keyed window (hot-tile straggler), " +
    "no quadratic join, bounded shuffle count") {
    val p = plan("tx_dedup_passages")
    // keeper must be the min-AGGREGATE form — a row_number window per
    // passage would put a boilerplate passage's every occurrence on
    // one task
    assert(!p.contains("Window"), s"passage-keyed window:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
    // tile → keeper agg, keep/cut equi-join, rebuild agg, totals agg +
    // id join: ≤ 6 hash exchanges (AQE may reuse co-partitioning)
    assert(countOf(p, "Exchange hashpartitioning") <= 6,
      s"extra shuffles:\n${p.take(3000)}")
  }

  test("decontamination: eval grams broadcast — the corpus side " +
    "never shuffles for the probe") {
    val p = plan("tx_decontam")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("asof join (plain path): exactly one data shuffle (the union " +
    "window)") {
    // the whole point of the union reformulation: both sides shuffle
    // ONCE on the key for the window; no join exchange, no cross
    // product appears anywhere. (The split path's shuffle budget is
    // gated in TemporalJoinsSpec.) The gate adds one more exchange for
    // its tie-insensitive right-side (key, ts) dedup — so: exactly one
    // exchange keyed on user_id alone (the window), ≤2 total.
    val p = plan("j_asof_click_plain")
    assert(countOf(p, "Exchange hashpartitioning") <= 2,
      s"asof join re-shuffles:\n${p.take(3000)}")
    val windowExchanges = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning(user_id") &&
        !l.contains(", ts")).size
    assert(windowExchanges == 1,
      s"expected ONE window shuffle on user_id:\n${p.take(3000)}")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("salted join: small side fans out per salt, join keys on " +
    "(key, __salt), no shuffle added to the big side beyond the join") {
    val p = plan("j_salted_skew")
    // the fan-out is a Generate(explode) over the salt sequence
    assert(p.contains("Generate explode"),
      s"salted join lost its fan-out:\n${p.take(3000)}")
    // the join must key on the salt column too — that IS the skew
    // spreading; a plan that drops __salt re-concentrates the hot key
    assert(p.contains("__salt"),
      s"salted join keys lost __salt:\n${p.take(3000)}")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("bloom incremental: probe side filters BEFORE the exact " +
    "anti-join; no broadcast of the full existing key set") {
    val p = plan("j5b_bloom_incremental")
    // the UDF probe must appear as a plain Filter on the incoming
    // scan — the candidates entering the anti-join are pre-thinned
    assert(p.contains("Filter"), p.take(2000))
    // the exact recheck is an ANTI join (left_anti semantics survive)
    assert(p.toLowerCase.contains("anti"),
      s"bloom path lost its exact anti-join recheck:\n${p.take(3000)}")
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

  test("bm25: top-k is a bounded TakeOrdered, scoring never " +
    "hash-shuffles the corpus") {
    // the only exchanges allowed: the 1-row stats aggregate
    // (SinglePartition) and its broadcast back — never a
    // hashpartitioning of document rows, and never a global Sort
    val p = plan("tx_bm25")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(countOf(p, "Exchange hashpartitioning") == 0,
      s"bm25 shuffles the corpus:\n${p.take(3000)}")
  }

  test("anvio cascade reuses one partitioning for its window stack") {
    // All five window stages partition by l_orderkey (or a superset
    // that starts with it) — at most 2 hash shuffles may appear
    // (orderkey+partkey stage, then orderkey stages).
    val p = plan("w3_anvio_cascade")
    assert(countOf(p, "Exchange hashpartitioning") <= 2,
      s"window stack re-shuffles:\n${p.take(3000)}")
  }

  test("cohort retention: no Expand — the 5 distinct counts ride one " +
    "dedup aggregate, not a ×5 replica of the event stream") {
    val p = plan("p1_cohort_retention")
    assert(!p.contains("Expand"),
      s"cohort retention Expands the events table:\n${p.take(3000)}")
  }

  test("heavy hitters: candidate recount is a broadcast semi-join — " +
    "the token stream itself never shuffles") {
    val p = plan("tx_heavy_hitters")
    // the exact recount must probe a BROADCAST candidate set (the
    // whole point: the full-vocab shuffle of tx_vocab_topk is what
    // this operator avoids)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidate probe not a broadcast semi-join:\n${p.take(3000)}")
    // hash exchanges carry only candidates/summaries: the candidate
    // distinct, the recount aggregate, the top-k window — never the
    // exploded token stream
    assert(countOf(p, "Exchange hashpartitioning") <= 3,
      s"heavy hitters shuffles more than its summaries:\n${p.take(3000)}")
  }

  test("pq adc: codes join a broadcast LUT; no corpus-side shuffle " +
    "before the per-pair aggregate") {
    val p = plan("x_pq_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"ADC LUT join is not broadcast:\n${p.take(3000)}")
  }

  test("pq refine: the exact re-rank joins the SHORTLIST to the " +
    "corpus — broadcast query side, no cartesian, no second " +
    "corpus-wide scoring pass") {
    val p = plan("x_pq_refine")
    assert(p.contains("BroadcastHashJoin"),
      s"refine query side not broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"),
      s"refine went all-pairs:\n${p.take(3000)}")
  }

  test("bounded top-k: BOTH surfaces (typed aggregator and SQL udaf) " +
    "partial-aggregate BEFORE the exchange — the shuffle carries " +
    "O(groups x k) buffers, and neither plans a per-group sort") {
    Seq("w12_topk_agg" -> "partial_topkaggregator",
        "w13_topk_sql" -> "partial_top_k3").foreach {
      case (gate, partialFn) =>
        val p = plan(gate)
        val ex = p.indexOf("Exchange hashpartitioning")
        val partial = p.indexOf(partialFn)
        assert(ex >= 0 && partial >= 0,
          s"$gate: missing exchange or partial agg:\n${p.take(3000)}")
        // executedPlan prints top-down, so the map-side partial agg
        // (which EXECUTES first) appears AFTER the exchange in text
        assert(partial > ex,
          s"$gate: partial aggregation did not happen map-side " +
            s"(before the shuffle):\n${p.take(3000)}")
        assert(!p.contains("SortExec") && !p.contains("Window"),
          s"$gate: bounded top-k must not plan a per-group sort or " +
            s"window:\n${p.take(3000)}")
    }
  }

  test("quantile sketch: two aggregate passes, no per-group value " +
    "collection (no collect_list / percentile sort) in the plan") {
    val p = plan("a11_quantile_sketch")
    assert(!p.contains("collect_list") && !p.contains("percentile"),
      s"quantile sketch materializes group values:\n${p.take(3000)}")
    // bin counts partial-aggregate map-side before the exchange
    assert(p.contains("HashAggregate"),
      s"bin counting is not a hash aggregate:\n${p.take(3000)}")
  }

  test("html doc extraction: exactly ONE shuffle (the per-doc " +
    "reassembly), explode + regex stages all shuffle-free") {
    val p = plan("s_warc_html_doc")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"html extraction grew extra shuffles:\n${p.take(3000)}")
    val blocks = plan("s_warc_html_extract")
    assert(!blocks.contains("Exchange hashpartitioning"),
      s"per-block extraction must be shuffle-free:\n${blocks.take(3000)}")
  }

  test("band-cap report: one partial-aggregated shuffle, no window " +
    "(strictly cheaper than the candidates join it audits)") {
    val p = plan("d_band_cap_report")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"cap report grew extra shuffles:\n${p.take(3000)}")
    assert(!p.contains("Window"),
      s"cap report must aggregate, not window:\n${p.take(3000)}")
    val ex = p.indexOf("Exchange hashpartitioning")
    val partial = p.indexOf("HashAggregate", ex)
    assert(partial > ex,
      s"bucket counts must partial-aggregate map-side:\n${p.take(3000)}")
  }

  test("fused profile percentiles: the data-sized histogram is " +
    "staged once; both branches read scratch parquet, not lineitem") {
    val p = plan("a20_profile_percentiles")
    // the union executes over the staged histogram: no lineitem scan
    // survives in the serving plan (the one data scan happened at
    // staging time inside Scratch)
    assert(!p.contains("l_extendedprice"),
      s"a20 is rescanning the data table:\n${p.take(3000)}")
    assert(countOf(p, "Union") >= 1)
  }
}
