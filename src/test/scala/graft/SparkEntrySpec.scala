package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the gate registry is assembled by merging
  * per-module maps, where a duplicate key would SILENTLY shadow a
  * query and shrink coverage — asserted against the sum of module
  * sizes. Also pins the oracle-key and naming invariants the driver
  * relies on, and the entry() smoke check itself. */
class SparkEntrySpec extends AnyFunSuite {

  private val moduleSizes = Seq(
    ops.Relational.queries.size, ops.ScaleOps.queries.size,
    ops.TemporalJoins.queries.size, ops.Windows.queries.size,
    ops.Pivots.queries.size, ops.Abundance.queries.size,
    ops.Amplicon.queries.size, ops.Bins.queries.size,
    ops.Checks.queries.size, ops.Glamr.queries.size,
    ops.Primers.queries.size, tax.Lineage.queries.size,
    tax.SetCover.queries.size,
    tax.TaxAbund.queries.size, text.TextOps.queries.size,
    dedup.Dedup.queries.size, sim.Similarity.queries.size,
    ingest.Overrides.queries.size,
    io.SourceQueries.queries.size, io.WarehouseIngest.queries.size,
    io.CatalogIngest.queries.size,
    streaming.Streams.queries.size,
    multimodal.Multimodal.queries.size)

  test("no query-key collisions across modules") {
    assert(SparkEntry.queries.size == moduleSizes.sum,
      s"merged map has ${SparkEntry.queries.size} keys but modules " +
        s"declare ${moduleSizes.sum} — a duplicate name is shadowing " +
        "a query")
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
