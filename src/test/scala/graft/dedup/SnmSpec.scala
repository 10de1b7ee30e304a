package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Sorted-neighborhood blocking: window adjacency, verify scores,
  * the recall gap it trades for linearity, and blockingQuality's
  * exact accounting of that gap. */
class SnmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // sort keys (first 16 alnum chars) order the docs:
  // 0,1 (same prefix, near-dups) | 7 "hi" | 3 | 4,5 (near-dups) | 6 | 8 | 2
  // the (2,3) near-dup pair lands 5 ranks apart -> outside window 5
  private lazy val docs = Seq(
    (0L, "alpha bravo charlie delta echo foxtrot golf hotel india"),
    (1L, "alpha bravo charlie delta echo foxtrot golf hotel juliet"),
    (2L, "zulu yankee xray whiskey victor uniform tango sierra"),
    (3L, "whiskey victor uniform tango sierra zulu yankee xray"),
    (4L, "xavier one two three four five six"),
    (5L, "xylophone one two three four five six"),
    (6L, "yak yodel yurt yam yew yolk yard"),
    (7L, "hi"),
    (8L, "yucca yam one more filler words here")
  ).toDF("doc_id", "text")

  private lazy val pairs =
    Dedup.snmPairs(docs, "doc_id", "text", w = 5).cache()

  test("same-prefix near-dups are adjacent and verified") {
    val r = pairs.filter(col("doc_a") === 0 && col("doc_b") === 1)
      .select("dist", "jac").as[(Int, Double)].collect()
    assert(r.toSeq == Seq((1, 0.75))) // 6 shared of 8 distinct grams
  }

  test("candidate count is the exact window arithmetic") {
    // 9 ranks, dist 1..4: sum(min(4, 9-r)) = 26
    assert(pairs.count() == 26)
  }

  test("a near-dup pair outside the window is NOT proposed") {
    assert(pairs.filter(col("doc_a") === 2 && col("doc_b") === 3)
      .count() == 0)
  }

  test("zero-gram docs score 0, not null, not crash") {
    val j = pairs.filter(col("doc_a") === 7 || col("doc_b") === 7)
      .select("jac").as[Double].collect()
    assert(j.nonEmpty && j.forall(_ == 0.0))
  }

  test("blockingQuality: exact recall/precision of the window trade") {
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .filter(col("jac") >= 0.2)
    val q = Dedup.blockingQuality(truth,
      pairs.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"))
    val r = q.select("n_truth", "n_cand", "n_hit", "recall", "precision")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r == ((3L, 26L, 2L, 0.666667, 0.076923)))
  }

  test("blockingQuality: the r18 single-pass form keeps JOIN null " +
    "semantics — null keys dedup within a side, never hit across") {
    // truth: 2 distinct non-null keys + 1 null-keyed (twice → dedups);
    // cand: 1 matching key, 1 non-matching, the SAME null key (which
    // must NOT count as a hit: SQL join equality never matches NULL)
    val truth = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (3L, 4L), (null, 9L), (null, 9L))
      .toDF("doc_a", "doc_b")
    val cand = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (5L, 6L), (null, 9L))
      .toDF("doc_a", "doc_b")
    val r = Dedup.blockingQuality(truth, cand, Seq("doc_a", "doc_b"))
      .select("n_truth", "n_cand", "n_hit", "recall", "precision")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r == ((3L, 3L, 1L, 0.333333, 0.333333)))
  }

  test("blockingQuality: empty sides yield zero counts and 0.0 " +
    "ratios, not nulls") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val some = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r0 = Dedup.blockingQuality(empty, empty, Seq("doc_a", "doc_b"))
      .select("n_truth", "n_cand", "n_hit", "recall", "precision")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r0 == ((0L, 0L, 0L, 0.0, 0.0)))
    val r1 = Dedup.blockingQuality(some, empty, Seq("doc_a", "doc_b"))
      .select("n_truth", "n_cand", "n_hit", "recall", "precision")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r1 == ((1L, 0L, 0L, 0.0, 0.0)))
  }

  test("window widening recovers the missed pair") {
    val wide = Dedup.snmPairs(docs, "doc_id", "text", w = 6)
    assert(wide.filter(col("doc_a") === 2 && col("doc_b") === 3)
      .count() == 1)
  }

  test("NULL-text docs are excluded (the editDistancePairs convention)") {
    val withNull = docs.unionByName(
      Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val p = Dedup.snmPairs(withNull, "doc_id", "text", w = 5)
    assert(p.filter(col("doc_a") === 99 || col("doc_b") === 99)
      .count() == 0)
    // and the remaining ranks are untouched by the null row
    assert(p.count() == pairs.count())
  }

  test("prefix-filter candidates are COMPLETE at the threshold " +
    "(the AllPairs theorem on the fixture)") {
    val t = 0.2
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .filter(col("jac") >= t).select("doc_a", "doc_b")
    val cand = Dedup.prefixFilterCandidates(docs, "doc_id", "text", t)
    assert(truth.join(cand, Seq("doc_a", "doc_b"), "left_anti")
      .count() == 0)
  }

  test("simhash band candidates superset the verified hamming<=3 " +
    "pairs (pigeonhole); the blocking-methods gate carries all four " +
    "geometries") {
    val d = graft.TestSpark.sf0001
    val corpus = graft.Tables.t(spark, d, "documents")
    val cand = Dedup.simhashBandCandidates(corpus, "doc_id", "text",
      maxBucketSize = Int.MaxValue)
    val verified = Dedup.simhashCandidatePairs(corpus, "doc_id", "text",
      maxBucketSize = Int.MaxValue)
    assert(verified.select("doc_a", "doc_b")
      .join(cand, Seq("doc_a", "doc_b"), "left_anti").count() == 0)
    val methods = graft.SparkEntry.queries("d_blocking_methods")(
        spark, d)
      .select("method").as[String].collect().toSet
    assert(methods == Set("minhash_lsh", "prefix_filter",
      "simhash_bands", "snm_w5"))
  }

  test("blocking-methods table: prefix recall 1.0, snm pays recall " +
    "for linearity") {
    val t = 0.2
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .filter(col("jac") >= t).select("doc_a", "doc_b")
    def q(cand: org.apache.spark.sql.DataFrame) =
      Dedup.blockingQuality(truth, cand, Seq("doc_a", "doc_b"))
        .select("recall").as[Double].head()
    assert(q(Dedup.prefixFilterCandidates(docs, "doc_id", "text", t))
      == 1.0)
    assert(q(pairs.select("doc_a", "doc_b")) == 0.666667)
  }
}
