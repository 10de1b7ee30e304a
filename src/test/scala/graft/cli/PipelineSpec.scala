package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.nio.file.Files

/** The end-to-end ETL driver: runs the full cycle twice — the second
  * run must be an incremental no-op on the fact table (the reference's
  * nightly-rerun semantics). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pipeline runs end-to-end and reruns incrementally") {
    val wh = Files.createTempDirectory("graft_pipe").toString
    Pipeline.run(spark, TestSpark.sf0001, wh)
    val n1 = spark.read.parquet(s"$wh/lineitem_inc").count()
    assert(n1 > 0)
    assert(spark.read.parquet(s"$wh/tpm2").count() > 0)
    assert(spark.table("brand_revenue").count() > 0)

    // rerun: same input, nothing new → fact table unchanged
    Pipeline.run(spark, TestSpark.sf0001, wh)
    assert(spark.read.parquet(s"$wh/lineitem_inc").count() == n1)
  }
}
