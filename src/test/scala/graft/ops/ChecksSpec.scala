package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spot-count check: paired doubling, mismatches, unknown runs") {
    val counts = Seq(
      ("SRR1", 3000L), // PAIRED 1500 spots → 3000 reads: ok
      ("SRR2", 800L),  // SINGLE 800 spots: ok
      ("SRR3", 900L),  // PAIRED 500 spots → expected 1000: MISMATCH
      ("SRR9", 100L)   // not in runinfo: flagged
    ).toDF("run", "n_reads")
    val runinfo = Seq(
      ("SRR1", "PAIRED", 1500L),
      ("SRR2", "SINGLE", 800L),
      ("SRR3", "PAIRED", 500L)
    ).toDF("run", "library_layout", "spots")
    val bad = Checks.spotCountMismatches(counts, runinfo)
      .select("run").as[String].collect().toSet
    assert(bad == Set("SRR3", "SRR9"))
  }

  test("paired-model check: agreement passes, disagreement/missing flag") {
    val winners = Seq(
      ("s1", "fwd", "16S"), ("s1", "rev", "16S"), // ok
      ("s2", "fwd", "16S"), ("s2", "rev", "18S"), // disagree
      ("s3", "fwd", "16S"),                       // missing rev
      ("s4", "fwd", "16S"),
      ("s4", "rev", null.asInstanceOf[String])    // side with no model
    ).toDF("sample", "direction", "model")
    val bad = Checks.pairedModelDisagreements(winners)
      .collect().map(r => r.getAs[String]("sample") ->
        r.getAs[String]("models")).toMap
    assert(bad.keySet == Set("s2", "s3", "s4"))
    assert(bad("s2") == "16S,18S")
  }
}
