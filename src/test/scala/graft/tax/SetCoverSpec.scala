package graft.tax

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** T4 greedy set cover (reference `AnnotateContigs.pl:541-554`):
  * hand-built candidates exercising the sort cascade, the
  * covers-something acceptance rule, and the determinism tie-break. */
class SetCoverSpec extends AnyFunSuite {
  import SetCover.Candidate

  test("greedy accepts by (uniq, score, completeness) and skips covered") {
    val cands = Seq(
      Candidate("lin_a", 5, 100.0, 90.0, Seq("g1", "g2", "g3")),
      Candidate("lin_b", 3, 80.0, 85.0, Seq("g2", "g3")), // fully covered
      Candidate("lin_c", 3, 80.0, 85.0, Seq("g4")),
      Candidate("lin_d", 1, 10.0, 10.0, Seq("g1", "g4")) // covered by a+c
    )
    assert(SetCover.greedy(cands) == Seq("lin_a", "lin_c"))
  }

  test("tie on all three keys breaks by lineage string (determinism)") {
    val cands = Seq(
      Candidate("lin_z", 2, 50.0, 50.0, Seq("g1")),
      Candidate("lin_a", 2, 50.0, 50.0, Seq("g1")))
    // identical stats and coverage: lin_a sorts first, covers g1,
    // lin_z then covers nothing new
    assert(SetCover.greedy(cands) == Seq("lin_a"))
  }

  test("distributed wrapper aggregates facts then filters accepted") {
    val spark = TestSpark.spark
    import spark.implicits._
    val facts = Seq(
      // gene, lineage, score, uniq
      ("g1", "k;p;a", 10.0, true),
      ("g2", "k;p;a", 9.0, true),
      ("g3", "k;p;b", 5.0, false),
      ("g3", "k;p;a", 1.0, false), // g3 also hit by a (covered there)
      ("g4", "k;p;c", 2.0, false)
    ).toDF("gene", "lineage", "score", "uniq")
    val (accepted, kept) = SetCover.screenLineages(facts)
    // a covers g1,g2,g3; b adds nothing; c adds g4
    assert(accepted == Seq("k;p;a", "k;p;c"))
    assert(kept.count() == 4) // rows of a and c
  }
}
