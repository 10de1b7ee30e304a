package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.Expectations._

/** Expectation-suite semantics: per-rule violation counts, null
  * conventions (null is not a range/domain violation, null FKs pass),
  * unique surplus accounting, and the one-scan row-rule compilation. */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(5.0), Some("A")),
    (1L, Some(500.0), Some("A")), // dup key + range violation
    (2L, None: Option[Double], Some("N")), // null amount
    (3L, Some(7.0), Some("Z")), // bad domain value
    (3L, Some(8.0), None: Option[String]), // dup key + null flag
    (3L, Some(9.0), Some("A")) // triple key
  ).toDF("k", "amount", "flag")

  private lazy val dim = Seq(1L, 2L).toDF("id")

  private def counts(rules: Seq[Rule]): Map[String, Long] =
    evaluate(df, rules).select("rule_id", "n_violations")
      .as[(String, Long)].collect().toMap

  test("row rules: not_null / range / accepted_values conventions") {
    val m = counts(Seq(
      NotNull("nn", "amount"),
      InRange("rg", "amount", 0.0, 100.0),
      AcceptedValues("av", "flag", Seq("A", "N"))))
    assert(m("nn") == 1) // one null amount
    assert(m("rg") == 1) // 500 out of range; the NULL does not count
    assert(m("av") == 1) // 'Z'; the NULL does not count
  }

  test("unique counts surplus rows, not groups") {
    val m = counts(Seq(Unique("u", Seq("k"))))
    assert(m("u") == 3) // key 1: 1 surplus; key 3: 2 surplus
  }

  test("unique on a genuinely unique compound key passes") {
    val m = counts(Seq(Unique("u2", Seq("k", "amount"))))
    assert(m("u2") == 0) // (k, amount) is distinct in the fixture
  }

  test("foreign key counts non-null orphans") {
    val m = counts(Seq(ForeignKey("fk", "k", dim, "id")))
    assert(m("fk") == 3) // the three k=3 rows; no null keys to exempt
  }

  test("pass flag and metadata columns") {
    val out = evaluate(df, Seq(
      NotNull("nn", "amount"), Unique("u", Seq("k"))))
    assert(out.columns.toSeq == Seq("rule_id", "rule_type", "target",
      "n_violations", "pass"))
    assert(out.filter(col("pass")).count() == 0) // both rules fire here
    val types = out.select("rule_id", "rule_type")
      .as[(String, String)].collect().toMap
    assert(types == Map("nn" -> "not_null", "u" -> "unique"))
  }

  test("duplicate rule ids rejected") {
    intercept[IllegalArgumentException] {
      evaluate(df, Seq(NotNull("x", "amount"), NotNull("x", "flag")))
    }
  }

  test("unsafe rule ids rejected (stack-expr injection guard)") {
    intercept[IllegalArgumentException] {
      evaluate(df, Seq(NotNull("bad'id", "amount")))
    }
  }

  test("empty input reports 0 violations / pass=true, not NULLs") {
    val out = evaluate(df.limit(0), Seq(
      NotNull("nn", "amount"), InRange("rg", "amount", 0.0, 1.0),
      Unique("u", Seq("k"))))
    val m = out.select("rule_id", "n_violations", "pass")
      .as[(String, Long, Boolean)].collect()
    assert(m.length == 3 && m.forall(r => r._2 == 0L && r._3))
  }

  test("quarantine splits the batch; clean + quarantined == input") {
    val (clean, quar) = quarantine(df, Seq(
      NotNull("nn", "amount"),
      InRange("rg", "amount", 0.0, 100.0),
      Unique("u", Seq("k")),
      ForeignKey("fk", "k", dim, "id")))
    assert(clean.count() + quar.count() == df.count())
    assert(clean.columns.toSeq == df.columns.toSeq)
    assert(quar.columns.toSeq == df.columns.toSeq :+ "violated_rules")
    // union of the two sides is the input, row for row
    val rejoined = clean.unionByName(quar.drop("violated_rules"))
    assert(rejoined.exceptAll(df).count() == 0)
    assert(df.exceptAll(rejoined).count() == 0)
  }

  test("quarantine: the clean side genuinely satisfies the suite") {
    val rules = Seq(
      NotNull("nn", "amount"),
      InRange("rg", "amount", 0.0, 100.0),
      Unique("u", Seq("k")),
      ForeignKey("fk", "k", dim, "id"))
    val (clean, _) = quarantine(df, rules)
    val m = evaluate(clean, rules).select("rule_id", "pass")
      .as[(String, Boolean)].collect().toMap
    assert(m.values.forall(identity), s"clean side still violates: $m")
  }

  test("quarantine: violated_rules is the id-sorted violation list") {
    val (_, quar) = quarantine(df, Seq(
      InRange("rg", "amount", 0.0, 100.0),
      ForeignKey("fk", "k", dim, "id")))
    val m = quar.select("amount", "violated_rules")
      .as[(Option[Double], String)].collect().toMap
    // k=3 rows are FK orphans; amount=500 additionally out of range
    assert(m(Some(500.0)) == "rg")
    assert(m(Some(7.0)) == "fk" && m(Some(8.0)) == "fk"
      && m(Some(9.0)) == "fk")
  }

  test("quarantine: Unique holds back surplus rows, keeps one per key") {
    val (clean, quar) = quarantine(df, Seq(Unique("u", Seq("k"))))
    assert(quar.count() == 3) // 1 surplus for k=1, 2 for k=3
    assert(clean.select("k").distinct().count() == clean.count())
    assert(clean.count() == 3) // one survivor per key
  }

  test("gate at sf0.001: r3/r4/r5 fire, the other three hold") {
    // r5 genuinely fires: the driver's synthetic lineitem has 1,161
    // duplicate (l_orderkey, l_linenumber) groups at sf0.001
    // (verified with DuckDB) — it is NOT TPC-H-unique.
    val g = graft.SparkEntry.queries("q_expectations")(
      spark, "/root/testdata/sf0.001")
    val m = g.select("rule_id", "pass").as[(String, Boolean)]
      .collect().toMap
    assert(m == Map(
      "r1_notnull_shipdate" -> true, "r2_range_quantity" -> true,
      "r3_range_discount" -> false, "r4_returnflag_domain" -> false,
      "r5_unique_line" -> false, "r6_fk_orderkey" -> true))
  }
}
