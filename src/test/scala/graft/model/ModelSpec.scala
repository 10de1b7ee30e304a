package graft.model

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The typed Dataset[T] surface: `.as[T]` is a schema assertion, and
  * typed pipelines agree with their untyped twins. */
class ModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("typed loads assert the schema and roundtrip values") {
    import spark.implicits._
    val li = Model.lineitems(spark, d)
    val first = li.filter(_.l_orderkey >= 0).head()
    assert(first.l_quantity > 0)
    assert(Model.docs(spark, d).head().text.nonEmpty)
    assert(Model.embeddings(spark, d).head().embedding.length == 64)
  }

  test("typed filter+agg equals untyped on the same predicate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val typed = Model.lineitems(spark, d)
      .filter(l => l.l_discount > 0.05 && l.l_quantity < 24)
      .map(_.l_extendedprice)
      .reduce(_ + _)
    val untyped = graft.Tables.t(spark, d, "lineitem")
      .filter(col("l_discount") > 0.05 && col("l_quantity") < 24)
      .agg(sum("l_extendedprice")).head.getDouble(0)
    assert(math.abs(typed - untyped) < 1e-6 * math.abs(untyped))
  }

  test("drifted schema fails at analysis time, not with silent nulls") {
    import spark.implicits._
    // events does not match the Lineitem shape → AnalysisException
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.Tables.t(spark, d, "events").as[Model.Lineitem].head()
    }
  }
}
