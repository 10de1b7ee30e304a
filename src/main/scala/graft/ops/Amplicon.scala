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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_trunc_search" -> gTruncSearch _)

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
         WHERE rn = 1""")
}
