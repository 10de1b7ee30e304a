package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariant ports (SURVEY §5.3): the reference's embedded correctness
  * checks as assertion-producing stages. Each returns the VIOLATIONS
  * as a DataFrame — empty means the invariant holds; callers decide
  * whether to abort (the reference aborts) or quarantine.
  */
object Checks {

  /** Read counts must equal the SRA-declared spot count (reference
    * `pypelib/raw_reads.py:17-49`, wired at `Snakefile:347-379`).
    * counts: (run, n_reads); runinfo: (run, library_layout, spots).
    * PAIRED runs have 2 reads per spot, SINGLE 1. */
  def spotCountMismatches(counts: DataFrame,
      runinfo: DataFrame): DataFrame = {
    val expected = runinfo.select(col("run"),
      when(col("library_layout") === "PAIRED", col("spots") * 2)
        .otherwise(col("spots")).as("expected_reads"))
    counts.join(expected, Seq("run"), "left")
      .filter(col("expected_reads").isNull ||
        col("n_reads") =!= col("expected_reads"))
      .select("run", "n_reads", "expected_reads")
  }

  /** Forward/reverse reads of a pair must agree on the winning model
    * (the core of the reference's E-code pairing checks,
    * `guess_target.py:310-426`: paired samples whose fwd and rev
    * detections disagree are flagged).
    * winners: (sample, direction 'fwd'|'rev', model). Returns samples
    * whose directions disagree or are missing a side. */
  def pairedModelDisagreements(winners: DataFrame): DataFrame =
    winners.groupBy("sample")
      .agg(
        // a side with no winning model is itself a pairing failure —
        // countDistinct skips NULLs, so coalesce to a sentinel first
        countDistinct(coalesce(col("model"), lit("__NONE__")))
          .as("n_models"),
        countDistinct("direction").as("n_dirs"),
        concat_ws(",", sort_array(collect_set(col("model"))))
          .as("models"))
      .filter(col("n_models") =!= 1 || col("n_dirs") =!= 2)
      .select("sample", "n_dirs", "models")
}
