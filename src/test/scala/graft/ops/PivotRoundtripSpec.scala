package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** SURVEY §5 property: pivot(unpivot(x)) = x. */
class PivotRoundtripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("pivot(unpivot(part)) reproduces the original columns") {
    val original = graft.Tables.t(spark, d, "part")
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retailprice"))
    val long = graft.SparkEntry.queries("p2_unpivot")(spark, d)
    val back = long.groupBy("p_partkey")
      .pivot("metric", Seq("size", "retailprice"))
      .agg(first("value"))
    assert(back.exceptAll(original).count() == 0)
    assert(original.exceptAll(back).count() == 0)
  }

  test("quality tier boundaries hit exactly (F9 golden edges)") {
    import spark.implicits._
    val edges = Seq(
      (91.0, 5.0, "HIGH"),   // >90, <=5
      (90.0, 5.0, "MEDIUM"), // not >90 → falls through, >=50 & <10
      (91.0, 5.1, "MEDIUM"),
      (50.0, 9.99, "MEDIUM"),
      (49.99, 5.0, "LOW"),   // >=30 & <50 contamination
      (30.0, 49.99, "LOW"),
      (29.9, 0.0, "FAIL"),
      (30.0, 50.0, "FAIL")
    ).toDF("completeness", "contamination", "want")
    val got = edges.withColumn("quality",
      when(col("completeness") > 90 && col("contamination") <= 5, "HIGH")
        .when(col("completeness") >= 50 && col("contamination") < 10,
          "MEDIUM")
        .when(col("completeness") >= 30 && col("contamination") < 50,
          "LOW")
        .otherwise("FAIL"))
    assert(got.filter(col("quality") =!= col("want")).count() == 0)
  }
}
