package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Domain invariants ported from the reference's embedded checks
  * (SURVEY §5): Σ TPM = 1e6 per sample, rel_abund sums to 1, funnel
  * percentages telescope, rollup w_subtax ≠ direct on internal nodes. */
class InvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("TPM sums to 1e6 per sample (tpm.R:25-30 invariant)") {
    val bad = Abundance.tpm(spark, d)
      .groupBy("sample").agg(sum("tpm").as("s"))
      .filter(abs(col("s") - 1e6) > 1.0) // rounding at 4dp over ~1k rows
      .count()
    assert(bad == 0)
  }

  test("gene_abundance TPM sums to 1e6 per file") {
    val bad = graft.SparkEntry.queries("s_gene_abund")(spark, d)
      .groupBy("sample").agg(sum("tpm").as("s"))
      .filter(abs(col("s") - 1e6) > 1e-6).count()
    assert(bad == 0)
  }

  test("rel_abund sums to 1 per sample") {
    val bad = graft.SparkEntry.queries("a2_rel_abund")(spark, d)
      .groupBy("sample").agg(sum("rel_abund").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-3).count()
    assert(bad == 0)
  }

  test("funnel percentages telescope (product of ratios = last/first)") {
    val rows = graft.SparkEntry.queries("w1_funnel")(spark, d)
      .orderBy("state_rank").collect()
    val ns = rows.map(_.getAs[Long]("n").toDouble)
    val pcts = rows.drop(1).map(_.getAs[Double]("pct_of_prev"))
    val prod = pcts.map(_ / 100.0).product
    assert(math.abs(prod - ns.last / ns.head) < 1e-4)
  }

  test("subtree rollup: w_subtax ≠ direct on internal nodes, = on leaves" +
    " (tax_abund_from_contigs.R:90-92)") {
    val roll = graft.SparkEntry.queries("t3_subtree_rollup")(spark, d)
    val internal = roll.filter(!col("node").contains("sz"))
    // internal nodes aggregate >1 leaf → direct stays 0, w_subtax > 0
    assert(internal.filter(col("abund_direct") =!= 0.0).count() == 0)
    assert(internal.filter(col("abund_w_subtax") <= 0.0).count() == 0)
    val leaves = roll.filter(col("node").contains("sz"))
    assert(leaves
      .filter(col("abund_w_subtax") =!= col("abund_direct")).count() == 0)
    // conservation: Σ roots = Σ leaves
    val rootSum = roll.filter(!col("node").contains(";"))
      .agg(sum("abund_w_subtax")).head.getDouble(0)
    val leafSum = leaves.agg(sum("abund_direct")).head.getDouble(0)
    assert(math.abs(rootSum - leafSum) < 1.0)
  }

  test("approx_count_distinct tracks exact within 5% (the A10 scale path)") {
    val both = graft.Tables.t(spark, d, "lineitem")
      .agg(countDistinct("l_partkey").as("exact"),
        approx_count_distinct("l_partkey").as("approx"))
      .head()
    val exact = both.getLong(0).toDouble
    val approx = both.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("N50 is a quantity present in the group and ≥ median mass point") {
    val n50 = graft.SparkEntry.queries("a7_n50")(spark, d)
    assert(n50.count() > 0)
    assert(n50.filter(col("n50") <= 0).count() == 0)
  }
}
