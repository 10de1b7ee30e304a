package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Alpha/beta diversity on hand-computed communities: Simpson family
  * values, Bray–Curtis identity/disjoint extremes and a hand-checked
  * mid case, zero-overlap pairs present via the grid. */
class EcologySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // long-form community matrix: (sample, taxon, n) built from raw
  // rows so `abundance` itself is exercised too
  private lazy val rows = Seq(
    // sample 1: taxa 10,11,12,13 with n=1 each (perfectly even)
    (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
    // sample 2: taxon 10 ×4 (monoculture)
    (2L, 10L), (2L, 10L), (2L, 10L), (2L, 10L),
    // sample 3: taxa 20,21 with n=3,1 (skewed; disjoint from 1 and 2)
    (3L, 20L), (3L, 20L), (3L, 20L), (3L, 21L)
  ).toDF("l_suppkey", "l_partkey")
    .withColumn("l_quantity", lit(1.0))

  private lazy val ab = Ecology.abundance(rows)

  test("alpha: even community — simpson 1-1/S, inv_simpson = S") {
    val r = Ecology.alphaDiversity(ab).filter($"sample" === 1L)
      .select("richness", "n_total", "simpson", "inv_simpson",
        "berger_parker")
      .as[(Long, Long, Double, Double, Double)].head()
    // 4 taxa n=1: sum_sq=4, N=4 → simpson = (16-4)/16 = 0.75,
    // inv = 16/4 = 4, bp = 1/4
    assert(r == ((4L, 4L, 0.75, 4.0, 0.25)))
  }

  test("alpha: monoculture — simpson 0, dominance 1") {
    val r = Ecology.alphaDiversity(ab).filter($"sample" === 2L)
      .select("richness", "simpson", "inv_simpson", "berger_parker")
      .as[(Long, Double, Double, Double)].head()
    assert(r == ((1L, 0.0, 1.0, 1.0)))
  }

  test("alpha: skewed community hand value") {
    val r = Ecology.alphaDiversity(ab).filter($"sample" === 3L)
      .select("simpson", "berger_parker")
      .as[(Double, Double)].head()
    // n = (3,1): sum_sq = 10, N = 4 → simpson = (16-10)/16 = 0.375
    assert(r == ((0.375, 0.75)))
  }

  test("bray-curtis: disjoint pairs = 1 and appear despite no join hit") {
    val bc = Ecology.brayCurtis(ab).cache()
    val m = bc.select("sample_a", "sample_b", "n_shared", "bray_curtis")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // all 3 pairs present
    assert(m.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // samples 1,3 and 2,3 disjoint -> BC 1, zero shared taxa
    assert(m((1L, 3L)) == ((0L, 1.0)))
    assert(m((2L, 3L)) == ((0L, 1.0)))
    // samples 1,2 share taxon 10 with min(1,4)=1: BC = (4+4-2)/8 = 0.75
    assert(m((1L, 2L)) == ((1L, 0.75)))
  }

  test("beta presence: jaccard/sorensen extremes and a mid case") {
    val bp = Ecology.betaPresence(ab).cache()
    val m = bp.select("sample_a", "sample_b", "n_shared",
        "jaccard_dissim", "sorensen_dissim")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // disjoint pairs: dissimilarity 1 under both metrics
    assert(m((1L, 3L)) == ((0L, 1.0, 1.0)))
    assert(m((2L, 3L)) == ((0L, 1.0, 1.0)))
    // samples 1 (taxa 10..13) and 2 (taxon 10): |A∩B|=1, |A∪B|=4 →
    // jaccard 1-1/4 = 0.75; sorensen 1-2/(4+1) = 0.6
    assert(m((1L, 2L)) == ((1L, 0.75, 0.6)))
  }

  test("beta presence of identical sets is 0 under both metrics") {
    val dup = ab.union(ab.filter($"sample" === 1L)
      .withColumn("sample", lit(9L)))
    val r = Ecology.betaPresence(dup)
      .filter($"sample_a" === 1L && $"sample_b" === 9L)
      .select("jaccard_dissim", "sorensen_dissim")
      .as[(Double, Double)].head()
    assert(r == ((0.0, 0.0)))
  }

  test("cooccurrence: counts, jaccard, lift on a hand case") {
    // 4 samples; taxon 100 in all 4, taxon 200 in samples 1,2,
    // taxon 300 in samples 3,4 — 200/300 never co-occur
    val rows = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      (1L, 200L), (2L, 200L), (3L, 300L), (4L, 300L)
    ).toDF("l_suppkey", "l_partkey")
    val co = Ecology.cooccurrence(Ecology.abundance(rows), 3).cache()
    val m = co.select("taxon_a", "taxon_b", "n_both", "jaccard", "lift")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // all 3 pairs present (grid includes zero-co-occurrence pairs)
    assert(m.keySet == Set((100L, 200L), (100L, 300L), (200L, 300L)))
    // 100&200: both in samples 1,2 → n_both 2, jaccard 2/4 = 0.5,
    // lift 2·4/(4·2) = 1.0 (independent)
    assert(m((100L, 200L)) == ((2L, 0.5, 1.0)))
    // 200&300 disjoint: lift 0, jaccard 0
    assert(m((200L, 300L)) == ((0L, 0.0, 0.0)))
  }

  test("cooccurrence: top-k bounds the pair universe") {
    val co = Ecology.cooccurrence(ab, 2)
    // only the 2 most prevalent taxa survive → exactly 1 pair row
    assert(co.count() == 1)
  }

  test("bray-curtis of a sample against an identical copy is 0") {
    val dup = ab.union(ab.filter($"sample" === 1L)
      .withColumn("sample", lit(9L)))
    val r = Ecology.brayCurtis(dup)
      .filter($"sample_a" === 1L && $"sample_b" === 9L)
      .select("bray_curtis").as[Double].head()
    assert(r == 0.0)
  }
}
