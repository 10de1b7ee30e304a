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

  test("percentile_approx tracks exact percentile within 5% " +
    "(the A4 scale path: exact per-group sort → mergeable sketch)") {
    val both = graft.Tables.t(spark, d, "events")
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("exact"),
        expr("percentile_approx(value, 0.5, 1000)").as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val exact = r.getDouble(1)
      val approx = r.getDouble(2)
      assert(math.abs(approx - exact) / math.max(exact, 1e-9) < 0.05,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("N50 is a quantity present in the group and ≥ median mass point") {
    val n50 = graft.SparkEntry.queries("a7_n50")(spark, d)
    assert(n50.count() > 0)
    assert(n50.filter(col("n50") <= 0).count() == 0)
  }

  test("dup clusters: total partition of docs, labels are minima, " +
    "edge endpoints co-clustered") {
    val docs = graft.Tables.t(spark, d, "documents")
    val cc = graft.SparkEntry.queries("d_dup_clusters")(spark, d)
    // every doc appears exactly once
    assert(cc.count() == docs.count())
    assert(cc.select("doc_id").distinct().count() == docs.count())
    // labels never exceed their node; canonical ⇔ self-labeled;
    // one canonical per cluster
    assert(cc.filter(col("cluster_id") > col("doc_id")).count() == 0)
    assert(cc.filter(col("is_canonical") =!=
      (col("cluster_id") === col("doc_id"))).count() == 0)
    assert(cc.filter(col("is_canonical")).count() ==
      cc.select("cluster_id").distinct().count())
    // soundness: the two ends of every candidate pair landed in the
    // SAME cluster (the fixpoint actually closed over the edges)
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id",
      "text", blockCols = Seq("lang", "source"), n = 3)
    val ca = cc.select(col("doc_id").as("doc_a"),
      col("cluster_id").as("cl_a"))
    val cb = cc.select(col("doc_id").as("doc_b"),
      col("cluster_id").as("cl_b"))
    assert(pairs.join(ca, "doc_a").join(cb, "doc_b")
      .filter(col("cl_a") =!= col("cl_b")).count() == 0)
  }

  test("corpus curate: survivors are unique canonical docs above the " +
    "quality bar") {
    val out = graft.SparkEntry.queries("tx_corpus_curate")(spark, d)
    assert(out.count() > 0)
    assert(out.select("doc_id").distinct().count() == out.count())
    assert(out.filter(col("quality") < 0.5).count() == 0)
    assert(out.filter(!col("split").isin("train", "val", "test"))
      .count() == 0)
  }

  test("stratified sample: exactly min(20, stratum size) per lang") {
    val docs = graft.Tables.t(spark, d, "documents")
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.SparkEntry.queries("tx_stratified_sample")(spark, d)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == sizes.keySet)
    got.foreach { case (lang, n) =>
      assert(n == math.min(20L, sizes(lang)), s"$lang: $n")
    }
  }
}
