package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-with-manual-overrides semantics (SURVEY §7.4 risk 6;
  * reference `pypelib/amplicon/dispatch.py:26-28,118-127,361-377`):
  * the assignment table is machine-written AND hand-edited. Regenerating
  * it must:
  *  - keep every MANUAL row (no `__AUTO__` prefix) untouched — hand
  *    edits survive regeneration;
  *  - honor SKIP rows (they stay in the table, excluded downstream);
  *  - replace machine rows (`__AUTO__`-prefixed) with the fresh
  *    machine proposal — but only for keys without a manual row.
  *
  * This is an explicit overrides-table join, not a naive overwrite.
  */
object Overrides {

  val AutoPrefix = "__AUTO__"
  val Skip = "SKIP"

  /** `existing`: current table (key, assignment) where machine rows are
    * `__AUTO__x` and manual rows are plain (`SKIP` allowed).
    * `proposed`: fresh machine output (key, assignment), un-prefixed.
    * Returns the regenerated table. */
  def mergeAssignments(existing: DataFrame,
      proposed: DataFrame): DataFrame = {
    // null assignments count as MANUAL (a blank hand-edited cell must
    // survive, not be silently dropped by a null predicate and then
    // overwritten by a machine row)
    val manual = existing.filter(
      col("assignment").isNull ||
        !col("assignment").startsWith(AutoPrefix))
    val machine = proposed
      .join(manual.select("key"), Seq("key"), "left_anti")
      .select(col("key"),
        concat(lit(AutoPrefix), col("assignment")).as("assignment"))
    manual.unionByName(machine)
  }

  /** Downstream view: effective assignments — prefix stripped, SKIP
    * and null (unassigned) rows removed. */
  def effective(table: DataFrame): DataFrame =
    table
      .withColumn("assignment",
        regexp_replace(col("assignment"), s"^$AutoPrefix", ""))
      .filter(col("assignment").isNotNull && col("assignment") =!= Skip)
}
