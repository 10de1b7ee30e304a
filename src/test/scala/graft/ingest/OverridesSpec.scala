package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Dispatch-override merge (reference `dispatch.py` semantics):
  * manual edits and SKIPs survive regeneration; machine rows refresh. */
class OverridesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("manual rows and SKIPs survive; machine rows refresh") {
    val existing = Seq(
      ("s1", "__AUTO__16S"), // machine, will be refreshed
      ("s2", "18S"),         // manual edit — must survive verbatim
      ("s3", "SKIP"),        // manual skip — must survive
      ("s4", "__AUTO__16S")  // machine, no longer proposed → dropped
    ).toDF("key", "assignment")
    val proposed = Seq(
      ("s1", "23S"), // machine changed its mind
      ("s2", "16S"), // ignored: manual wins
      ("s3", "16S"), // ignored: manual (SKIP) wins
      ("s5", "16S")  // new sample
    ).toDF("key", "assignment")

    val merged = Overrides.mergeAssignments(existing, proposed)
      .as[(String, String)].collect().toMap
    assert(merged == Map(
      "s1" -> "__AUTO__23S",
      "s2" -> "18S",
      "s3" -> "SKIP",
      "s5" -> "__AUTO__16S"))

    val eff = Overrides.effective(
      merged.toSeq.toDF("key", "assignment"))
      .as[(String, String)].collect().toMap
    assert(eff == Map("s1" -> "23S", "s2" -> "18S", "s5" -> "16S"))
  }

  test("null (blank) assignments are manual and survive regeneration") {
    val existing = Seq(("k9", Option.empty[String]),
      ("k1", Option("__AUTO__x"))).toDF("key", "assignment")
    val proposed = Seq(("k9", "fresh"), ("k1", "y"))
      .toDF("key", "assignment")
    val merged = Overrides.mergeAssignments(existing, proposed)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(merged("k9").isEmpty)            // blank edit preserved
    assert(merged("k1") == Some("__AUTO__y")) // machine refreshed
    // effective view drops the unassigned row
    assert(Overrides.effective(
      Overrides.mergeAssignments(existing, proposed))
      .filter(org.apache.spark.sql.functions.col("key") === "k9")
      .count() == 0)
  }

  test("merge is idempotent when nothing changes") {
    val t1 = Seq(("a", "__AUTO__x"), ("b", "manual")).toDF("key", "assignment")
    val prop = Seq(("a", "x")).toDF("key", "assignment")
    val once = Overrides.mergeAssignments(t1, prop)
    val twice = Overrides.mergeAssignments(once, prop)
    assert(once.collect().toSet == twice.collect().toSet)
  }
}
