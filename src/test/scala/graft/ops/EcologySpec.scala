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

  test("shannon: hand values — uniform community hits ln S, " +
    "monoculture hits 0, pielou NULL only for S = 1") {
    val sh = Ecology.shannonDiversity(ab).cache()
    val m = sh.select("sample", "richness", "shannon", "hill_q1",
        "pielou")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // sample 1: uniform over 4 taxa → H = ln 4, hill = 4, pielou = 1
    assert(math.abs(m(1L)._2 - math.log(4.0)) < 1e-12)
    assert(math.abs(m(1L)._3 - 4.0) < 1e-9)
    assert(math.abs(m(1L)._4.get - 1.0) < 1e-12)
    // sample 2: monoculture → H = 0 exactly (clamped), hill = 1,
    // pielou NULL (0/0)
    assert(m(2L)._2 == 0.0 && m(2L)._3 == 1.0 && m(2L)._4.isEmpty)
    // sample 3: n = (3,1) → H = ln4 − (3·ln3)/4 (ln1 = 0)
    val h3 = math.log(4.0) - 3.0 * math.log(3.0) / 4.0
    assert(math.abs(m(3L)._2 - h3) < 1e-12)
  }

  test("shannon properties: 0 ≤ H ≤ ln S with H = 0 iff S = 1; " +
    "hill_q1 = exp(H); invariant under taxon relabeling " +
    "(sf0.001 lineitem communities)") {
    val abFull = Ecology.abundance(
      graft.Tables.t(spark, TestSpark.sf0001, "lineitem"))
    val sh = Ecology.shannonDiversity(abFull)
      .select("sample", "richness", "shannon", "hill_q1")
      .as[(Long, Long, Double, Double)].collect()
    assert(sh.nonEmpty)
    sh.foreach { case (s, rich, h, hill) =>
      assert(h >= 0.0, s"sample $s: H < 0")
      assert(h <= math.log(rich.toDouble) + 1e-9,
        s"sample $s: H ${h} exceeds ln S ${math.log(rich.toDouble)}")
      assert(if (rich == 1L) h == 0.0 else h > 0.0,
        s"sample $s: H = 0 must hold iff S = 1 (S=$rich, H=$h)")
      assert(math.abs(hill - math.exp(h)) < 1e-9 * math.max(1.0, hill))
    }
    // relabeling taxa cannot move any index — the per-taxon terms are
    // identical; only the FP summation ORDER may shift (repartitioned
    // groups), so compare within an ulp-scale tolerance
    val relabeled = Ecology.shannonDiversity(
        abFull.withColumn("taxon", -col("taxon") * 7))
      .select("sample", "shannon").as[(Long, Double)].collect().toMap
    val base = sh.map(r => r._1 -> r._3).toMap
    assert(relabeled.keySet == base.keySet)
    base.foreach { case (s, h) =>
      assert(math.abs(relabeled(s) - h) < 1e-12,
        s"sample $s: H moved under taxon relabeling")
    }
  }

  test("shannon ordering agrees with inv_simpson on the fixture: " +
    "even > skewed > monoculture") {
    val sh = Ecology.shannonDiversity(ab)
      .select("sample", "shannon").as[(Long, Double)].collect().toMap
    val inv = Ecology.alphaDiversity(ab)
      .select("sample", "inv_simpson").as[(Long, Double)].collect()
      .toMap
    assert(sh(1L) > sh(3L) && sh(3L) > sh(2L))
    assert(inv(1L) > inv(3L) && inv(3L) > inv(2L))
  }

  test("bray-curtis of a sample against an identical copy is 0") {
    val dup = ab.union(ab.filter($"sample" === 1L)
      .withColumn("sample", lit(9L)))
    val r = Ecology.brayCurtis(dup)
      .filter($"sample_a" === 1L && $"sample_b" === 9L)
      .select("bray_curtis").as[Double].head()
    assert(r == 0.0)
  }

  // ---- UniFrac on a hand-built 3-level taxonomy ----

  private lazy val ufPart = Seq(
    (1L, "A", "x", 1), (2L, "A", "x", 2), (3L, "B", "y", 1)
  ).toDF("p_partkey", "p_brand", "p_type", "p_size")

  // S1 = {p1:2, p3:1} (N=3), S2 = {p2:1} (N=1)
  private lazy val ufLineitem = Seq(
    (1L, 1L), (1L, 1L), (1L, 3L), (2L, 2L)
  ).toDF("l_suppkey", "l_partkey")

  private lazy val ufBt = Ecology.branchAbundance(ufLineitem, ufPart)

  test("branch abundance: subtree counts and the depth·N identity") {
    val m = ufBt.as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // S1's branches: A:2, A;x:2, A;x;sz1:2, B:1, B;y:1, B;y;sz1:1
    assert(m == Map(
      (1L, "A") -> 2L, (1L, "A;x") -> 2L, (1L, "A;x;sz1") -> 2L,
      (1L, "B") -> 1L, (1L, "B;y") -> 1L, (1L, "B;y;sz1") -> 1L,
      (2L, "A") -> 1L, (2L, "A;x") -> 1L, (2L, "A;x;sz2") -> 1L))
    // Σ_branches n = TreeDepth · N per sample
    val tot = ufBt.groupBy("sample").agg(sum("n").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(tot == Map(1L -> 9L, 2L -> 3L))
  }

  test("unifrac: hand values — shared trunk, divergent leaves") {
    val r = Ecology.unifrac(ufBt)
      .select("sample_a", "sample_b", "n_reads_a", "n_reads_b",
        "branches_a", "branches_b", "shared_branches",
        "unifrac_unweighted", "w_num", "unifrac_weighted")
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, String,
        Double)].collect()
    assert(r.length == 1)
    val (sa, sb, na, nb, ba, bb, sh, uu, wn, uw) = r.head match {
      case t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8,
        t._9, t._10)
    }
    assert((sa, sb, na, nb, ba, bb, sh) ==
      ((1L, 2L, 3L, 1L, 6L, 3L, 2L)))
    // unweighted = (6+3-4)/(6+3-2) = 5/7
    assert(uu == 0.714286)
    // w_num = 6·3·1 − 2·(min(2·1,1·3) + min(2·1,1·3)) = 18 − 8 = 10
    // (direct check: Σ|p_A−p_B| = 10/3, normalizer 2d = 6 → 10/18)
    assert(wn == "10")
    assert(uw == 0.555556)
  }

  test("unifrac: identical communities → 0; fully disjoint → 1") {
    val dup = ufBt.union(ufBt.filter($"sample" === 1L)
      .withColumn("sample", lit(9L)))
    val same = Ecology.unifrac(dup)
      .filter($"sample_a" === 1L && $"sample_b" === 9L)
      .select("unifrac_unweighted", "unifrac_weighted")
      .as[(Double, Double)].head()
    assert(same == ((0.0, 0.0)))
    // a community on a disjoint subtree (brand C) vs S2 (all under A)
    val cPart = Seq((4L, "C", "z", 7))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val cBt = Ecology.branchAbundance(
      Seq((7L, 4L), (7L, 4L)).toDF("l_suppkey", "l_partkey"), cPart)
    val disj = Ecology.unifrac(ufBt.union(cBt))
      .filter($"sample_a" === 2L && $"sample_b" === 7L)
      .select("unifrac_unweighted", "unifrac_weighted")
      .as[(Double, Double)].head()
    assert(disj == ((1.0, 1.0)))
  }

  test("unifrac is tree-aware where leaf-level beta is blind: " +
    "same-trunk vs different-trunk divergence") {
    // S1 = leaf A;x;sz1, S2 = leaf A;x;sz2 (sister leaves),
    // S3 = leaf B;y;sz1 (different trunk). Leaf-level Jaccard calls
    // both pairs fully disjoint; UniFrac sees the shared A;x trunk.
    val p = Seq((1L, "A", "x", 1), (2L, "A", "x", 2), (3L, "B", "y", 1))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val li = Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("l_suppkey", "l_partkey")
    val u = Ecology.unifrac(Ecology.branchAbundance(li, p))
      .select("sample_a", "sample_b", "unifrac_unweighted",
        "unifrac_weighted")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // sisters share 2 of 4 union branches: (3+3-4)/(3+3-2) = 0.5
    assert(u((1L, 2L)) == ((0.5, lit2dp(2.0 / 6.0))))
    // different trunks share nothing: 1 under both metrics
    assert(u((1L, 3L)) == ((1.0, 1.0)))
  }

  private def lit2dp(x: Double): Double =
    math.rint(x * 1e6) / 1e6

  test("unifrac: a non-branch table (sum not divisible by depth) " +
    "fails loudly instead of silently de-exacting") {
    // two samples so a pair row exists and n_reads is evaluated;
    // 2 branches n=1 each per sample → t_sum 2, not divisible by 3
    val notBranches = Seq((1L, "A", 1L), (1L, "B", 1L),
      (2L, "A", 1L), (2L, "B", 1L)).toDF("sample", "branch", "n")
    val e = intercept[Exception] {
      Ecology.unifrac(notBranches).collect()
    }
    assert(e.getMessage.contains("not divisible by depth"),
      e.getMessage)
  }
}
