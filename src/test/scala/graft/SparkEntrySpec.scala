package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the gate registry is assembled by merging
  * per-module maps, where a duplicate key would SILENTLY shadow a
  * query and shrink coverage — asserted against the sum of module
  * sizes. Also pins the oracle-key and naming invariants the driver
  * relies on, and the entry() smoke check itself. */
class SparkEntrySpec extends AnyFunSuite {

  // Derived from the SAME sequence SparkEntry.queries folds over, so a
  // new module can't reach the driver without being covered here (the
  // r12 failure mode: a hand-maintained list went stale).
  private val declaredSum = SparkEntry.queryModules.map(_.size).sum

  test("no query-key collisions across modules") {
    assert(SparkEntry.queries.size == declaredSum,
      s"merged map has ${SparkEntry.queries.size} keys but modules " +
        s"declare $declaredSum — a duplicate name is shadowing " +
        "a query")
  }

  test("no oracle-key collisions across modules") {
    assert(SparkEntry.oracleSql.size ==
      SparkEntry.oracleModules.map(_.size).sum,
      "a duplicate oracle key is shadowing an oracle")
  }

  test("every oracle key has a query; names are path/JSON-safe") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
    val badNames = SparkEntry.queries.keys
      .filterNot(_.matches("^[a-z0-9_]+$"))
    assert(badNames.isEmpty, s"unsafe query names: $badNames")
  }

  test("oracle SQL contains no tab/newline-sensitive raw controls " +
    "that JSON escaping must cover") {
    // the Verify escaper handles these, but a stray vertical tab or
    // similar would be a new class — keep the SQL to printable + \n\t
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.exists(c => c < ' ' && c != '\n' && c != '\t' && c != '\r')
    }
    assert(bad.isEmpty, s"control chars in: ${bad.keys}")
  }

  test("entry() (driver smoke) returns rows at sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    val spark = TestSpark.spark
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (_, fn) => fn(spark, TestSpark.sf0001).count() == 0
    }
    assert(empty.isEmpty,
      s"queries with empty results: ${empty.map(_._1)}")
  }
}
