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

    // simulate a manual edit to the assignments table: it must survive
    // the rerun (Overrides semantics end-to-end through the pipeline)
    import spark.implicits._
    val edited = spark.read.parquet(s"$wh/assignments")
      .as[(String, String)].collect().toMap
      .updated("3", "MANUAL_TARGET") + ("999" -> "SKIP")
    edited.toSeq.toDF("key", "assignment")
      .write.mode("overwrite").parquet(s"$wh/assignments")

    // rerun: same input, nothing new → fact table unchanged
    Pipeline.run(spark, TestSpark.sf0001, wh)
    assert(spark.read.parquet(s"$wh/lineitem_inc").count() == n1)
    val after = spark.read.parquet(s"$wh/assignments")
      .as[(String, String)].collect().toMap
    assert(after("3") == "MANUAL_TARGET") // hand edit survived
    assert(after("999") == "SKIP")        // skip survived
  }
}
