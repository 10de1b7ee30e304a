package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the round-9 additions: empty frames
  * return empty (never throw), single-row groups behave, and the
  * documented guards fire loudly. */
class NewOpsEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
  private lazy val noEvents =
    Seq.empty[(Long, Long, Long, Double)]
      .toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  test("empty corpora: sessionize, containment, winnow, gopher, PPS, " +
    "corpus report, substring cut all return empty, never throw") {
    assert(ops.Windows.sessionize(noEvents, "user_id", "ts",
      "event_id", 1800000000L).count() == 0)
    assert(dedup.Dedup.containmentPairs(noDocs, "doc_id", "text",
      t = 0.5).count() == 0)
    assert(text.TextOps.winnowFingerprints(noDocs, "doc_id", "text")
      .count() == 0)
    assert(noDocs.select(
      text.TextOps.gopherRules(col("text")): _*).count() == 0)
    assert(text.TextOps.ppsSystematicSample(noDocs, "doc_id", "text",
      "lang", k = 5).count() == 0)
    assert(text.TextOps.corpusReport(noDocs, "doc_id", "text",
      Seq("lang")).count() == 0)
    assert(dedup.Dedup.substringCut(noDocs, "doc_id", "text")
      .count() == 0)
  }

  test("single-row groups: trend moments defined, derived values NULL " +
    "(one point determines no line)") {
    val out = ops.ScaleOps.groupTrend(
        Seq(("a", 5L, 2.0)).toDF("k", "x", "y"),
        Seq("k"), col("x"), col("y"))
      .collect().head
    assert(out.getLong(1) == 1 && out.getDouble(2) == 5.0)
    assert(out.isNullAt(7) && out.isNullAt(8) && out.isNullAt(9))
  }

  test("guards fire loudly: rrfFuse without a rank column, " +
    "PPS with k <= 0, sessionize with a non-positive gap") {
    val r = Seq((1L, 0.5)).toDF("doc_id", "score")
    intercept[IllegalArgumentException] {
      sim.Similarity.rrfFuse(Seq(r), "doc_id", k = 3)
    }
    intercept[IllegalArgumentException] {
      text.TextOps.ppsSystematicSample(noDocs, "doc_id", "text",
        "lang", k = 0)
    }
    intercept[IllegalArgumentException] {
      ops.Windows.sessionize(noEvents, "user_id", "ts", "event_id",
        gapUs = 0L)
    }
  }

  test("embedDecontam with an empty eval set flags nothing") {
    val corpus = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val evalSet = Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    assert(sim.Similarity.embedDecontam(corpus, evalSet, tau = 0.5)
      .count() == 0)
  }
}
