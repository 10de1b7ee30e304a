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

  test("single-mode override: 9/10 majority flips the stray, manual untouched") {
    val assigned = ((1 to 9).map(i => (s"m$i", "16S.f27.r338", "")) :+
      ("stray", "UNKNOWN", "") :+ ("skipme", "UNKNOWN", "SKIP"))
      .toDF("sample", "target", "override")
    // 9 known + 2 UNKNOWN = 11 rows, 9/11 = 0.818 >= 0.8 → fires
    val out = Overrides.singleModeOverride(assigned)
      .as[(String, String, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out("stray") == "__AUTO__16S.f27.r338")
    assert(out("skipme") == "SKIP") // manual override untouched
    assert(out("m1") == "")         // known rows untouched
  }

  test("single-mode override: below threshold or >2 targets → no override") {
    val below = ((1 to 7).map(i => (s"m$i", "16S.f27.r338", "")) ++
      (1 to 3).map(i => (s"u$i", "UNKNOWN", "")))
      .toDF("sample", "target", "override")
    assert(Overrides.singleModeOverride(below) // 7/10 < 0.8
      .filter($"override" =!= "").count() == 0)

    val threeTargets = (Seq(("a", "16S.f27.r338", ""),
      ("b", "18S.f1.r2", "")) ++
      (1 to 20).map(i => (s"m$i", "16S.f27.r338", "")) :+
      ("u", "UNKNOWN", "")).toDF("sample", "target", "override")
    assert(Overrides.singleModeOverride(threeTargets)
      .filter($"override" =!= "").count() == 0)
  }

  test("dispatch composes: assignTargets + single-mode + effectiveTarget") {
    val guessed = ((1 to 9).map(i => (s"m$i", "16S", "f27", "r338")) :+
      ("bad", "16S", "f27", "r338"))
      .toDF("sample", "model_name", "fwd_primer", "rev_primer")
    val errors = Seq(("bad", "E5", "too few")).toDF("sample", "code", "msg")
    val out = Overrides.effectiveTarget(
      Overrides.singleModeOverride(
        Overrides.assignTargets(guessed, errors)
          .withColumn(
            "override", org.apache.spark.sql.functions.lit(""))))
      .select("sample", "effective_target")
      .as[(String, String)].collect().toMap
    // the errored sample is UNKNOWN → auto-overridden to the majority
    assert(out("bad") == "16S.f27.r338")
    assert(out("m1") == "16S.f27.r338")
  }
}
