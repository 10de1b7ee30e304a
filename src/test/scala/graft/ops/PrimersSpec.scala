package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Primer-match scoring goldens (reference `alignment.py:122-172`,
  * `hmm_summarize.py:156-280`) — hand-computed against the PrimerMatch
  * score formulas. */
class PrimersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def primers = Seq(
    ("16S", "f27", "forward", 8, 27, 0),
    ("16S", "f515", "forward", 515, 533, 1),
    ("16S", "r338", "reverse", 338, 355, 0),
    ("16S", "r806", "reverse", 787, 806, 1)
  ).toDF("hmm_name", "primer_name", "pdirection", "pstart", "pend",
    "pidx")

  test("PrimerMatch score formulas: ahead/trailing/dirty, fwd and rev") {
    val aln = Seq(
      // fwd read starting right after f27 (ahead, score 0, clean) and
      // ending right before r338 (trailing, score 0, clean)
      ("r1", "16S", 28, 337, "+", 1, 310, 95.0),
      // hmmfrom inside f27 (dirty, score hmmfrom-start = 17); hmmto
      // past r338 start but before its end (dirty, hmmto-pend = -16)
      ("r3", "16S", 25, 339, "+", 2, 300, 76.0)
    ).toDF("qname", "model", "hmmfrom", "hmmto", "strand", "envfrom",
      "envto", "score")
    val out = Primers.scoreMatches(aln, primers).collect()
      .map(r => r.getAs[String]("qname") -> r).toMap
    val r1 = out("r1")
    assert(r1.getAs[String]("fwd_primer") == "f27")
    assert(r1.getAs[Int]("fwd_score") == 0)
    assert(r1.getAs[Boolean]("fwd_clean"))
    assert(r1.getAs[String]("rev_primer") == "r338")
    assert(r1.getAs[Int]("rev_score") == 0)
    assert(r1.getAs[Boolean]("rev_clean"))
    assert(r1.getAs[String]("direction") == "fwd")
    val r3 = out("r3")
    assert(r3.getAs[Int]("fwd_score") == 17) // 25 - 8, dirty
    assert(!r3.getAs[Boolean]("fwd_clean"))
    assert(r3.getAs[Int]("rev_score") == -16) // 339 - 355, dirty
    assert(!r3.getAs[Boolean]("rev_clean"))
  }

  test("rev match must sit right of the fwd primer; no-fwd keeps all") {
    // read aligned at the 3' end: best fwd is f515; r338 starts left of
    // f515's end, so only r806 is eligible (alignment.py:56-72)
    val aln = Seq(
      ("r4", "16S", 516, 800, "-", 900, 30, 60.0)
    ).toDF("qname", "model", "hmmfrom", "hmmto", "strand", "envfrom",
      "envto", "score")
    val r4 = Primers.scoreMatches(aln, primers).collect()(0)
    assert(r4.getAs[String]("direction") == "rev")
    assert(r4.getAs[String]("fwd_primer") == "f515")
    assert(r4.getAs[Int]("fwd_score") == 1) // 516 - 515, dirty
    assert(r4.getAs[String]("rev_primer") == "r806")
    assert(r4.getAs[Int]("rev_score") == -6) // 800 - 806, dirty

    // same alignment but with no forward primers in the model: any
    // rev primer competes and r338 (abs score) wins
    val noFwd = primers.filter(col("pdirection") === "reverse")
    val alone = Primers.scoreMatches(aln, noFwd).collect()(0)
    assert(alone.getAs[String]("fwd_primer") == null)
    assert(alone.getAs[String]("rev_primer") == "r806")
  }

  test("mode aggregation: top pair, counts, clean majority, medians") {
    val matched = Primers.scoreMatches(
      Primers.alnRows.toDF("qname", "model", "hmmfrom", "hmmto",
        "strand", "envfrom", "envto", "score"), primers)
      .withColumn("sample", lit("s"))
    val m = Primers.primerMode(matched).collect()(0)
    assert(m.getAs[String]("model") == "16S")
    assert(m.getAs[String]("direction") == "fwd")
    assert(m.getAs[String]("fwd_primer") == "f27")
    assert(m.getAs[Long]("fwd_count") == 5L)
    assert(m.getAs[String]("rev_primer") == "r338")
    assert(m.getAs[Long]("rev_count") == 5L)
    // fwd f27: clean scores {0,2,1} vs dirty {17,19} → clean majority,
    // median 1.0; rev r338: clean {0,-2,-1} vs dirty {-15,-16} →
    // clean majority, median -1.0
    assert(m.getAs[Boolean]("fwd_clean"))
    assert(m.getAs[Double]("fwd_med_score") == 1.0)
    assert(m.getAs[Boolean]("rev_clean"))
    assert(m.getAs[Double]("rev_med_score") == -1.0)
  }

  test("unclear directionality quarantines to null, never throws") {
    val aln = Seq(
      ("rX", "16S", 10, 50, "+", 60, 5, 30.0) // '+' but envfrom>envto
    ).toDF("qname", "model", "hmmfrom", "hmmto", "strand", "envfrom",
      "envto", "score")
    val out = Primers.withDirection(aln).collect()(0)
    assert(out.getAs[String]("direction") == null)
  }
}
