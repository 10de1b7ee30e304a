package graft

import org.scalatest.funsuite.AnyFunSuite

/** The extensions installer, wired the way a deployment wires it:
  * `spark.sql.extensions=graft.GraftExtensions` (set in TestSpark).
  * Every native function must resolve in plain SQL with no per-session
  * register calls. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("all native functions resolve through spark.sql.extensions") {
    assert(spark.sql("SELECT gc_content('GGCC') AS g")
      .head.getDouble(0) == 100.0)
    assert(spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0) == 11.0)
    assert(!spark.sql("SELECT simhash64(array('a','b')) AS s")
      .head.isNullAt(0))
    assert(spark.sql("SELECT size(minhash_sig('hello world')) AS n")
      .head.getInt(0) == 16)
    assert(spark.sql(
      "SELECT token_ngrams(array('a','b','c','d')) AS g")
      .head.getSeq[String](0) == Seq("a b c", "b c d"))
    // theta family: aggregate + all three set ops, exact at this size
    assert(spark.sql(
      """SELECT theta_estimate(theta_intersect(a, b)) AS i,
           theta_estimate(theta_union(a, b)) AS u,
           theta_estimate(theta_anotb(a, b)) AS d
         FROM (SELECT
           (SELECT theta_sketch(x) FROM
             (VALUES (1L),(2L),(3L)) t(x)) AS a,
           (SELECT theta_sketch(x) FROM
             (VALUES (2L),(3L),(4L),(5L)) t(x)) AS b)""")
      .head match { case r => (r.getLong(0), r.getLong(1),
        r.getLong(2)) == ((2L, 5L, 1L)) })
  }

  test("wrong arity fails analysis with a clear error") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array(1.0d))").collect()
    }
    assert(e1.getMessage.contains("dot_product"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT gc_content('A', 'B')").collect()
    }
    assert(e2.getMessage.contains("gc_content"))
  }

  test("DESCRIBE FUNCTION shows the injected usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION gc_content")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("gc_content"))
  }
}
