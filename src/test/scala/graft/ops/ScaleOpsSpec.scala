package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Incremental aggregate maintenance: merging partials must equal the
  * full recompute, for any batch split, including degenerate ones. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partial(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(
      sum(col("v").cast("decimal(18,2)")).as("sum_v"),
      count(lit(1)).as("n"))

  test("mergeGroupedAgg over 3 batches == full recompute") {
    val rows = (1 to 300).map(i => (s"k${i % 7}", i * 0.01))
    val full = partial(rows.toDF("k", "v"))
      .collect().map(_.toSeq).toSet
    val batches = rows.grouped(100)
      .map(b => partial(b.toDF("k", "v"))).toSeq
    val merged = ScaleOps.mergeGroupedAgg(batches, Seq("k"),
        Seq("sum_v"), "n")
      // merge widens the decimal (sum of decimal(28,2) partials);
      // normalize back for the comparison
      .select(col("k"), col("sum_v").cast("decimal(28,2)").as("sum_v"),
        col("n"))
    assert(merged.collect().map(_.toSeq).toSet == full)
  }

  test("merging an empty delta is a no-op") {
    val base = partial(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    val emptyDelta = partial(
      Seq.empty[(String, Double)].toDF("k", "v"))
    val merged = ScaleOps.mergeGroupedAgg(Seq(base, emptyDelta),
        Seq("k"), Seq("sum_v"), "n")
      .select(col("k"), col("sum_v").cast("decimal(28,2)").as("sum_v"),
        col("n"))
    assert(merged.collect().map(_.toSeq).toSet ==
      base.collect().map(_.toSeq).toSet)
  }

  test("merge keeps keys that exist in only one batch") {
    val b1 = partial(Seq(("only1", 5.0)).toDF("k", "v"))
    val b2 = partial(Seq(("only2", 7.0)).toDF("k", "v"))
    val merged = ScaleOps.mergeGroupedAgg(Seq(b1, b2), Seq("k"),
      Seq("sum_v"), "n")
    assert(merged.select("k").as[String].collect().toSet ==
      Set("only1", "only2"))
  }
}
