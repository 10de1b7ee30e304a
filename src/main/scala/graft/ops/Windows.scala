package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Window operators W1-W7 (SURVEY §2.6) plus N50 (A7).
  *
  * All windows here partition by a natural key of the fact table
  * (orderkey / suppkey / user_id). At cluster scale that means exactly one
  * shuffle on the partition key, then sort-within-partition — and when the
  * fact table is already bucketed/partitioned by that key the shuffle is
  * elided entirely (`Exchange` reuse shows in explain). Chained windows
  * over the SAME partition key (the anvio cascade) reuse one exchange.
  */
object Windows {

  /** W1 lag over ordered partition — the read-retention funnel shape
    * (reference `postgres.Rmd:269-284`: percent_retained =
    * count/lag(count) per (sample,direction) ordered by read_state).
    * Here: per-user event-value delta ordered by time. */
  private def w1Lag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, d, "events")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("event_id"), col("user_id"),
        round(col("value") - col("prev_value"), 4).as("delta"))
  }

  /** W1 applied as the GLAMR read-count funnel (reference
    * `postgres.Rmd:253-291`): ordered pipeline states, each state's count
    * divided by the previous state's → percent retained. Events types act
    * as the ordered `read_state` factor (signup→view→click→purchase),
    * encoded exactly like the reference's ordered factor: an explicit
    * rank map (`postgres.Rmd:272-273`). */
  private def w1Funnel(s: SparkSession, d: String): DataFrame = {
    val stateRank = when(col("event_type") === "signup", 0)
      .when(col("event_type") === "view", 1)
      .when(col("event_type") === "click", 2)
      .when(col("event_type") === "purchase", 3)
    // constant-VALUED partition key: the frame is 4 aggregated rows,
    // the single partition is intentional — keying it silences
    // WindowExec's single-partition warning so the bench tail only
    // flags REAL ones. Must be attribute-derived (pmod(x,1)=0), not a
    // literal: the optimizer eliminates foldable partition keys and
    // the warning returns
    val w = Window.partitionBy(pmod(col("state_rank"), lit(1)))
      .orderBy("state_rank")
    t(s, d, "events")
      .withColumn("state_rank", stateRank)
      .filter(col("state_rank").isNotNull)
      .groupBy("state_rank", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("pct_of_prev",
        round(col("n") * lit(100.0) / lag(col("n"), 1).over(w), 4))
      .select("state_rank", "event_type", "n", "pct_of_prev")
  }

  /** W2 grouped argmin/argmax, single winner (reference `slice_min(evalue)`
    * diamond tophits `postgres.Rmd:351-354`, with_ties=FALSE
    * `summarize_hmmscan.R:59-62`): deterministic tie-break cascade →
    * row_number. */
  private def w2Top1(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    t(s, d, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_extendedprice"))
  }

  /** W3 the anvio-heuristic cascade — the reference's most complex single
    * query (`postgres.Rmd:1420-1432` dplyr → `1455-1532` generated SQL):
    * rank-with-ties → count-over → sig rescue filter → rank → row_number.
    * Translated onto lineitem: gene≈(l_orderkey,l_partkey), ko≈line,
    * score≈l_extendedprice, sig≈(l_returnflag='R').
    * All five window stages share partition key l_orderkey (or its
    * superset) → one shuffle, chained sorts. */
  private def w3AnvioCascade(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "lineitem").filter(col("l_tax") < 0.07)
    val wGP = Window.partitionBy("l_orderkey", "l_partkey")
      .orderBy(col("l_extendedprice").desc)
    val wG = Window.partitionBy("l_orderkey")
    val wGScore = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc)
    val wGQty = Window.partitionBy("l_orderkey")
      .orderBy(col("l_quantity").desc, col("l_linenumber").asc)
    base
      .withColumn("r1", rank().over(wGP)).filter(col("r1") === 1).drop("r1")
      .withColumn("n_in_group", count(lit(1)).over(wG))
      .filter(col("n_in_group") === 1 || col("l_returnflag") === "R")
      .withColumn("r2", rank().over(wGScore)).filter(col("r2") === 1)
      .drop("r2")
      .withColumn("rn", row_number().over(wGQty)).filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"))
  }

  /** W4 grouped argmax with tie-DISCARD (reference `pick_winning_model`
    * drops reads whose top score is tied, `hmm_summarize.py:125-153`):
    * max + count-at-max, keep only unique winners. */
  private def w4TieDiscard(s: SparkSession, d: String): DataFrame = {
    val wG = Window.partitionBy("l_orderkey")
    t(s, d, "lineitem")
      .withColumn("max_qty", max(col("l_quantity")).over(wG))
      .filter(col("l_quantity") === col("max_qty"))
      .groupBy("l_orderkey", "max_qty")
      .agg(count(lit(1)).as("n_at_max"))
      .filter(col("n_at_max") === 1)
      .select(col("l_orderkey"), col("max_qty").as("winning_qty"))
  }

  /** W5 top-score-margin retention (reference keep hits with
    * score ≥ top×0.9 per gene, `AnnotateContigs.pl:384-396`). */
  private def w5MarginKeep(s: SparkSession, d: String): DataFrame = {
    val wG = Window.partitionBy("l_orderkey")
    t(s, d, "lineitem")
      .withColumn("max_price", max(col("l_extendedprice")).over(wG))
      .filter(col("l_extendedprice") >= col("max_price") * 0.9)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
  }

  /** W6 row_number as id over a global ordering (reference bin numbering
    * `standardize_bins.R:94-97`). Global window = single partition — only
    * valid on dimension-sized inputs; facts get `zipWithIndex`-style
    * monotonically_increasing_id instead. */
  private def w6RowNumberId(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .withColumn("nation_id",
        row_number().over(
          // attribute-derived constant key (see w1Funnel): keeps the
          // sanctioned 25-row global ordering warning-free; coalesce
          // keeps it total for null names (one partition, not two)
          Window.partitionBy(
              substring(coalesce(col("n_name"), lit("")), 0, 0))
            .orderBy(col("n_name").asc)))
      .select(col("nation_id"), col("n_name"))

  /** W7 cumulative sum (reference N50 prep `AnnotateContigs.pl:594-601`):
    * running spend per customer over order history. */
  private def w7Cumsum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_orderkey"), col("o_custkey"), col("running_spend"))
  }

  /** W8 time-RANGE frame (extension; SURVEY notes the reference uses
    * no range frames): moving 1-hour aggregate per user — the rolling
    * rate-limit / activity-burst shape. Spark's rangeBetween is
    * numeric, so the frame rides on unix_micros(ts); DuckDB states the
    * same window as RANGE BETWEEN INTERVAL 1 HOUR PRECEDING. Decimal
    * sum so frame-internal order can't move the hash. One shuffle on
    * user_id, same as any per-key window. */
  private def w8RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L) // [ts − 1h, ts], both inclusive
    t(s, d, "events")
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double"))
      .select(col("user_id"), col("event_id"), col("n_1h"),
        col("sum_1h"))
  }

  /** A7 N50 — order-dependent aggregate (reference
    * `AnnotateContigs.pl:594-601`: sort desc, cumsum, first value where
    * cumsum ≥ total/2). Pure window formulation, no UDAF. */
  private def a7N50(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.partitionBy("l_suppkey")
      .orderBy(col("l_quantity").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("l_suppkey")
    t(s, d, "lineitem")
      .withColumn("cum", sum(col("l_quantity")).over(wCum))
      .withColumn("total", sum(col("l_quantity")).over(wTot))
      .filter(col("cum") >= col("total") / 2)
      .groupBy("l_suppkey")
      .agg(round(max(col("l_quantity")), 2).as("n50"))
  }

  /** W9 rolling z-score — windowed anomaly scoring: each event's value
    * against the mean/std of its user's trailing-10-event frame.
    * Moments accumulate as EXACT decimal sums (Σx, Σx² — inputs
    * explicitly 6-dp-rounded first, the adcLut discipline, so the
    * decimal cast is identical cross-engine) and convert to double
    * only in the closed-form variance — no Welford recurrence, whose
    * float accumulation order no engine pins. Population variance
    * (÷n); a zero-variance or single-row frame scores NULL, never
    * ±inf. One shuffle on user_id; state per row is two sums and a
    * count regardless of frame width — the shape a 100 TB event table
    * needs (collecting the frame's values would not be). */
  private def w9RollingZscore(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-9, 0)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        count(col("value")).over(w).as("n_win"),
        sum(round(col("value"), 6).cast("decimal(28,6)")).over(w)
          .cast("double").as("sx"),
        sum(round(col("value") * col("value"), 6)
          .cast("decimal(38,6)")).over(w)
          .cast("double").as("sx2"))
      .withColumn("mean", col("sx") / col("n_win"))
      .withColumn("variance",
        greatest((col("sx2") - col("sx") * col("sx") / col("n_win"))
          / col("n_win"), lit(0.0)))
      .withColumn("stdv", sqrt(col("variance")))
      // OUTPUT CONTRACT: sx/sx2 are exact doubles (6-dp decimal sums
      // < 2^53/1e6 — no rounding, no tie), mean/std stay internal —
      // round(sx/n, 4) SYSTEMATICALLY lands on decimal ties that
      // Spark's shortest-repr rounding and DuckDB's binary rounding
      // resolve differently. The z-score's denominator is a square
      // root (irrational except degenerate frames), so its 4-dp round
      // is tie-free; + 0.0 normalizes IEEE −0.
      .select(col("user_id"), col("event_id"), col("n_win"),
        col("sx"), col("sx2"),
        when(col("stdv") > 0,
          round((col("value") - col("mean")) / col("stdv"), 4)
            + lit(0.0))
          .as("zscore"))
  }

  /** Gap-based sessionization: split each key's ordered event stream
    * wherever the inter-event gap exceeds `gapUs`, numbering sessions
    * 1..k per key. The classic lag → break-flag → running-sum
    * gaps-and-islands; all three stages share one partition key, so
    * the whole pass is ONE shuffle on `keyCol` at any scale. The gap
    * test runs on integer epoch-µs (exact, engine-portable — never
    * interval arithmetic on doubles). `tieCol` makes the in-key order
    * total so equal-timestamp events sessionize deterministically. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs=$gapUs must be > 0")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_tu", unix_micros(col(tsCol)))
      .withColumn("_brk",
        when(col("_tu") - lag(col("_tu"), 1).over(w) <= gapUs, 0)
          .otherwise(1)) // first row's lag is NULL -> comparison NULL -> 1
      .withColumn("session_seq", sum(col("_brk")).over(w).cast("int"))
      .drop("_tu", "_brk")
  }

  /** W10 gate: 30-minute-gap sessions over the event stream, rolled up
    * to one row per session. Epoch-µs bounds (exact integers) and a
    * decimal value sum — the w8/w9 cross-engine FP discipline. */
  private def w10Sessionize(s: SparkSession, d: String): DataFrame =
    sessionize(t(s, d, "events"), "user_id", "ts", "event_id",
      gapUs = 1800000000L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"),
        count(lit(1)).cast("int").as("n_events"),
        sum(round(col("value"), 6).cast("decimal(28,6)"))
          .cast("double").as("sum_value"))

  /** W11: the session-scoped funnel — what fraction of SESSIONS reach
    * each stage (W1's funnel counts events; per-session presence is
    * the product-analytics form: one purchase per session counts
    * once). Stage flags aggregate as max(bool) per session, then one
    * tiny rollup; the only data-sized shuffle is sessionize's. */
  private def w11SessionFunnel(s: SparkSession, d: String): DataFrame = {
    val stages = Seq("signup", "view", "click", "purchase")
    val flags = stages.map(st =>
      max(when(col("event_type") === st, 1).otherwise(0))
        .as(s"has_$st"))
    val sess = sessionize(t(s, d, "events"), "user_id", "ts",
        "event_id", gapUs = 1800000000L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(flags.head, flags.tail: _*)
    sess.agg(
      count(lit(1)).as("n_sessions"),
      stages.map(st => sum(col(s"has_$st")).as(s"n_$st")): _*)
  }

  /** W12: top-3 orders per customer via the BOUNDED `TopKAggregator`
    * — the scale path for W2's window form (shuffle payload
    * O(groups × k) instead of a full per-group sort). The oracle is
    * the window form itself: the aggregator must reproduce
    * row_number() ≤ k exactly, ties and all. */
  private def w12TopkAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = t(s, d, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
    TopK.topKPerGroup(ds, 3)
      .select(col("g").as("o_custkey"), col("rank"),
        col("tie").as("o_orderkey"), col("v").as("o_totalprice"))
  }

  /** W13: the SAME bounded top-k through the SQL surface —
    * `TopKAggregator` registered via `functions.udaf` (the dbplyr-
    * analog `spark.sql` entry point, `g_tpm_sql` precedent), exploded
    * back to relational rows. Shares `w12_topk_agg`'s oracle: the SQL
    * spelling must hash-match the typed window-form semantics. */
  private def w13TopkSql(s: SparkSession, d: String): DataFrame = {
    TopK.registerSql(s, 3)
    t(s, d, "orders").createOrReplaceTempView("w13_orders")
    s.sql("""
      SELECT o_custkey, CAST(pos + 1 AS INT) AS rank,
             e.tie AS o_orderkey, e.v AS o_totalprice
      FROM (SELECT o_custkey,
              top_k3(o_totalprice, o_orderkey) AS top
            FROM w13_orders GROUP BY o_custkey) g
      LATERAL VIEW posexplode(g.top.entries) x AS pos, e
    """)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w13_topk_sql" -> w13TopkSql _,
    "w12_topk_agg" -> w12TopkAgg _,
    "w11_session_funnel" -> w11SessionFunnel _,
    "w10_sessionize" -> w10Sessionize _,
    "w9_rolling_zscore" -> w9RollingZscore _,
    "w1_lag_delta" -> w1Lag _,
    "w1_funnel" -> w1Funnel _,
    "w2_top1_per_group" -> w2Top1 _,
    "w3_anvio_cascade" -> w3AnvioCascade _,
    "w4_tie_discard" -> w4TieDiscard _,
    "w5_margin_keep" -> w5MarginKeep _,
    "w6_row_number_id" -> w6RowNumberId _,
    "w7_cumsum" -> w7Cumsum _,
    "w8_range_frame" -> w8RangeFrame _,
    "a7_n50" -> a7N50 _)

  val oracle: Map[String, String] = Map(
    "w13_topk_sql" ->
      """SELECT o_custkey, CAST(rn AS INT) AS rank, o_orderkey,
           o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3""",
    "w12_topk_agg" ->
      """SELECT o_custkey, CAST(rn AS INT) AS rank, o_orderkey,
           o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3""",
    "w11_session_funnel" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, event_type,
             epoch_us(ts) AS tu,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT *, CASE WHEN tu - prev <= 1800000000 THEN 0 ELSE 1
             END AS brk FROM e),
         g AS (
           SELECT *, sum(brk) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)
             AS session_seq
           FROM f),
         sess AS (
           SELECT user_id, session_seq,
             max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS has_signup,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS has_view,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS has_click,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS has_purchase
           FROM g GROUP BY user_id, session_seq)
         SELECT count(*) AS n_sessions,
           CAST(sum(has_signup) AS BIGINT) AS n_signup,
           CAST(sum(has_view) AS BIGINT) AS n_view,
           CAST(sum(has_click) AS BIGINT) AS n_click,
           CAST(sum(has_purchase) AS BIGINT) AS n_purchase
         FROM sess""",
    "w10_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, value, epoch_us(ts) AS tu,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT *, CASE WHEN tu - prev <= 1800000000 THEN 0 ELSE 1
             END AS brk FROM e),
         g AS (
           SELECT *, CAST(sum(brk) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS INT)
             AS session_seq
           FROM f)
         SELECT user_id, session_seq,
           epoch_us(min(ts)) AS start_us,
           epoch_us(max(ts)) AS end_us,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
           CAST(count(*) AS INT) AS n_events,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
             AS sum_value
         FROM g GROUP BY user_id, session_seq""",
    "w9_rolling_zscore" ->
      """WITH m AS (
           SELECT user_id, event_id, value,
             count(value) OVER w AS n_win,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6)))
               OVER w AS DOUBLE) AS sx,
             CAST(sum(CAST(round(value * value, 6) AS DECIMAL(38,6)))
               OVER w AS DOUBLE) AS sx2
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
         v AS (
           SELECT *, sx / n_win AS mean,
             sqrt(greatest((sx2 - sx * sx / n_win) / n_win, 0.0))
               AS stdv
           FROM m)
         SELECT user_id, event_id, n_win, sx, sx2,
           CASE WHEN stdv > 0
             THEN round((value - mean) / stdv, 4) + 0.0 END AS zscore
         FROM v""",
    "w1_lag_delta" ->
      """SELECT event_id, user_id,
         round(value - lag(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
         FROM events""",
    "w1_funnel" ->
      """WITH staged AS (
           SELECT CASE event_type WHEN 'signup' THEN 0 WHEN 'view' THEN 1
             WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 END AS state_rank,
             event_type
           FROM events
           WHERE event_type IN ('signup','view','click','purchase')),
         counts AS (
           SELECT state_rank, event_type, count(*) AS n FROM staged
           GROUP BY state_rank, event_type)
         SELECT state_rank, event_type, n,
           round(n * 100.0 / lag(n) OVER (ORDER BY state_rank), 4)
             AS pct_of_prev
         FROM counts""",
    "w2_top1_per_group" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
         FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
           ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
           FROM lineitem) x WHERE rn = 1""",
    "w3_anvio_cascade" ->
      """WITH s0 AS (SELECT * FROM lineitem WHERE l_tax < 0.07),
         s1 AS (SELECT * FROM (SELECT *, rank() OVER
             (PARTITION BY l_orderkey, l_partkey
              ORDER BY l_extendedprice DESC) AS r1 FROM s0) a WHERE r1 = 1),
         s2 AS (SELECT *, count(*) OVER (PARTITION BY l_orderkey)
             AS n_in_group FROM s1),
         s3 AS (SELECT * FROM s2
             WHERE n_in_group = 1 OR l_returnflag = 'R'),
         s4 AS (SELECT * FROM (SELECT *, rank() OVER
             (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC) AS r2
             FROM s3) b WHERE r2 = 1),
         s5 AS (SELECT * FROM (SELECT *, row_number() OVER
             (PARTITION BY l_orderkey
              ORDER BY l_quantity DESC, l_linenumber ASC) AS rn
             FROM s4) c WHERE rn = 1)
         SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM s5""",
    "w4_tie_discard" ->
      """SELECT l_orderkey, max_qty AS winning_qty
         FROM (SELECT l_orderkey, max_qty, count(*) AS n_at_max
           FROM (SELECT l_orderkey, l_quantity,
             max(l_quantity) OVER (PARTITION BY l_orderkey) AS max_qty
             FROM lineitem) a
           WHERE l_quantity = max_qty
           GROUP BY l_orderkey, max_qty) b
         WHERE n_at_max = 1""",
    "w5_margin_keep" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM (SELECT *, max(l_extendedprice) OVER
           (PARTITION BY l_orderkey) AS max_price FROM lineitem) x
         WHERE l_extendedprice >= max_price * 0.9""",
    "w6_row_number_id" ->
      """SELECT CAST(row_number() OVER (ORDER BY n_name ASC) AS INT)
           AS nation_id, n_name
         FROM nation""",
    "w7_cumsum" ->
      """SELECT o_orderkey, o_custkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_spend
         FROM orders""",
    "w8_range_frame" ->
      """SELECT user_id, event_id, count(*) OVER w AS n_1h,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
           AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
    "a7_n50" ->
      """SELECT l_suppkey, round(max(l_quantity),2) AS n50
         FROM (SELECT l_suppkey, l_quantity,
           sum(l_quantity) OVER (PARTITION BY l_suppkey
             ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(l_quantity) OVER (PARTITION BY l_suppkey) AS total
           FROM lineitem) x
         WHERE cum >= total / 2
         GROUP BY l_suppkey""")
}
