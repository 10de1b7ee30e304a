package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Amplicon table stages (SURVEY §2.10 / §3.3): the DADA2-adjacent
  * dataflow the reference computes around the external denoiser —
  * specifically the truncation-parameter search
  * (`ampliconTrunc.R:170-246`): per-cycle weighted mean quality →
  * sliding-window smoothing → argmax cutoff per group.
  *
  * Mapped onto TESTDATA: group ≈ event_type, cycle ≈ minute-of-hour,
  * quality ≈ value weighted by props.k — same operator chain
  * (A5 weighted mean → W7-style frame window → W2 argmax).
  */
object Amplicon {

  /** Generic truncation search: input (grp, cycle, q, w) →
    * (grp, best_cycle, best_q): the cycle maximizing the trailing
    * `win`-cycle average of the weighted mean quality, ties → the
    * EARLIEST cycle (deterministic, mirrors slice_max(with_ties=FALSE)). */
  def truncationSearch(profiles: DataFrame, win: Int): DataFrame = {
    val perCycle = profiles
      .groupBy("grp", "cycle")
      .agg((sum(col("q") * col("w")) / sum(col("w"))).as("wq"))
    val wSlide = Window.partitionBy("grp").orderBy("cycle")
      .rowsBetween(-(win - 1), Window.currentRow)
    val smoothed = perCycle
      .withColumn("slide_q", avg(col("wq")).over(wSlide))
    val wBest = Window.partitionBy("grp")
      .orderBy(round(col("slide_q"), 6).desc, col("cycle").asc)
    smoothed.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("grp"), col("cycle").as("best_cycle"),
        round(col("slide_q"), 4).as("best_q"))
  }

  private def gTruncSearch(s: SparkSession, d: String): DataFrame =
    truncationSearch(
      t(s, d, "events").select(
        col("event_type").as("grp"),
        minute(col("ts")).as("cycle"),
        col("value").as("q"),
        get_json_object(col("props"), "$.k").cast("int").as("w")),
      win = 5)

  /** Read-tracking funnel table (reference `ampliconTrunc.R:330-342`):
    * a per-entity wide table built by CHAINED LEFT JOINS of per-stage
    * counts, with final-over-initial retention. Stage tables are
    * filtered aggregates of one scan; the joins key on the entity and
    * broadcast when stages are small. */
  private def gReadTracking(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    def stage(et: String, name: String): DataFrame =
      ev.filter(col("event_type") === et)
        .groupBy("user_id").agg(count(lit(1)).as(name))
    val wide = stage("signup", "n_signup")
      .join(stage("view", "n_view"), Seq("user_id"), "left")
      .join(stage("click", "n_click"), Seq("user_id"), "left")
      .join(stage("purchase", "n_purchase"), Seq("user_id"), "left")
      .na.fill(0L, Seq("n_view", "n_click", "n_purchase"))
    wide.select(col("user_id"), col("n_signup"), col("n_view"),
      col("n_click"), col("n_purchase"),
      round(col("n_purchase") * lit(100.0) / col("n_signup"), 4)
        .as("pct_converted"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_trunc_search" -> gTruncSearch _,
    "g_read_tracking" -> gReadTracking _)

  val oracle: Map[String, String] = Map(
    "g_trunc_search" ->
      """WITH per_cycle AS (
           SELECT event_type AS grp,
             CAST(minute(ts) AS INT) AS cycle,
             sum(value * CAST(json_extract_string(props,'$.k') AS INT)) /
               sum(CAST(json_extract_string(props,'$.k') AS INT)) AS wq
           FROM events GROUP BY 1, 2),
         smoothed AS (
           SELECT grp, cycle,
             avg(wq) OVER (PARTITION BY grp ORDER BY cycle
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS slide_q
           FROM per_cycle)
         SELECT grp, cycle AS best_cycle, round(slide_q, 4) AS best_q
         FROM (SELECT *, row_number() OVER (PARTITION BY grp
           ORDER BY round(slide_q, 6) DESC, cycle ASC) AS rn
           FROM smoothed) x
         WHERE rn = 1""",
    "g_read_tracking" ->
      """WITH su AS (SELECT user_id, count(*) AS n_signup FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
         vw AS (SELECT user_id, count(*) AS n_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         ck AS (SELECT user_id, count(*) AS n_click FROM events
           WHERE event_type = 'click' GROUP BY user_id),
         pu AS (SELECT user_id, count(*) AS n_purchase FROM events
           WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT su.user_id, su.n_signup,
           coalesce(vw.n_view, 0) AS n_view,
           coalesce(ck.n_click, 0) AS n_click,
           coalesce(pu.n_purchase, 0) AS n_purchase,
           round(coalesce(pu.n_purchase, 0) * 100.0 / su.n_signup, 4)
             AS pct_converted
         FROM su
         LEFT JOIN vw USING(user_id)
         LEFT JOIN ck USING(user_id)
         LEFT JOIN pu USING(user_id)""")
}
