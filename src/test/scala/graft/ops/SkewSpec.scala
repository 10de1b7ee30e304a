package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-computed skew reports: Gini via the rank formulation on tiny
  * count vectors, top-k partial-block take, uniform → 0 extreme. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(counts: Seq[(String, Int)], topK: Int = 10) = {
    val df = counts.flatMap { case (k, n) => Seq.fill(n)(k) }
      .toDF("k")
    Skew.skewReport(df, Seq("k"), topK)
      .select("n_rows", "n_keys", "max_cnt", "max_share", "topk_share",
        "mean_per_key", "gini")
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
  }

  test("hand case: counts (1,1,2,4)") {
    // sorted asc ranks 1..4: Σ rank·c = 1+2+6+16 = 25
    // gini = (50 − 5·8)/(4·8) = 0.3125; ties (two 1s) share a block
    val r = report(Seq(("a", 1), ("b", 1), ("c", 2), ("d", 4)))
    assert(r == ((8L, 4L, 4L, 0.5, 1.0, 2.0, 0.3125)))
  }

  test("top-k takes a partial block deterministically") {
    val r = report(Seq(("a", 1), ("b", 1), ("c", 2), ("d", 4)),
      topK = 2)
    // top-2 counts 4+2 = 6 of 8
    assert(r._5 == 0.75)
  }

  test("uniform distribution has gini 0") {
    val r = report(Seq(("a", 3), ("b", 3), ("c", 3)))
    assert(r._7 == 0.0)
    assert(r._4 == 0.333333) // 3/9 rounded
  }

  test("two keys 9:1") {
    // Σ rank·c = 1 + 18 = 19 → gini = (38 − 3·10)/(2·10) = 0.4
    val r = report(Seq(("hot", 9), ("cold", 1)))
    assert(r == ((10L, 2L, 9L, 0.9, 1.0, 5.0, 0.4)))
  }

  test("composite keys group jointly") {
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x"))
      .toDF("a", "b")
    val r = Skew.skewReport(df, Seq("a", "b"))
      .select("n_rows", "n_keys", "max_cnt")
      .as[(Long, Long, Long)].head()
    assert(r == ((4L, 3L, 2L)))
  }

  test("join cardinality: exact inner size, overlap, worst key") {
    // left: k1×3, k2×2, k3×1; right: k1×4, k2×1, k4×5
    val left = (Seq.fill(3)("k1") ++ Seq.fill(2)("k2") ++ Seq("k3"))
      .toDF("lk")
    val right = (Seq.fill(4)("k1") ++ Seq("k2") ++ Seq.fill(5)("k4"))
      .toDF("rk")
    val r = Skew.joinCardinality(left, "lk", right, "rk")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .head()
    // inner = 3·4 + 2·1 = 14; worst key k1 = 12
    assert(r == ((6L, 10L, 3L, 3L, 2L, 1L, 1L, 14L, 12L)))
    // the report's inner_rows equals the actual join's count
    assert(left.join(right, $"lk" === $"rk").count() == 14L)
  }

  test("join cardinality: disjoint keys → zero inner rows") {
    val r = Skew.joinCardinality(
        Seq("a", "a").toDF("lk"), "lk", Seq("b").toDF("rk"), "rk")
      .select("n_keys_both", "inner_rows", "max_pair_rows",
        "left_only_keys", "right_only_keys")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((0L, 0L, 0L, 1L, 1L)))
  }
}
