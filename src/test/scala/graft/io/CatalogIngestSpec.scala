package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the catalog loaders' edge semantics; the full
  * fixture parity vs DuckDB runs through the `s_*` gates. */
class CatalogIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("date cascade: each format parses; later formats never " +
    "shadow earlier ones; garbage → null") {
    val df = Seq("2014-05", "2014-05-07", "2014-05-07 10:30:15",
        "2014-05-07 10:30", "NA", "05/07/2014", "2014-13")
      .toDF("s")
      .select(col("s"), CatalogIngest.dateCascade(col("s")).as("d"))
    val out = df.as[(String, Option[java.sql.Date])].collect().toMap
    assert(out("2014-05").contains(java.sql.Date.valueOf("2014-05-01")))
    assert(out("2014-05-07")
      .contains(java.sql.Date.valueOf("2014-05-07")))
    assert(out("2014-05-07 10:30:15")
      .contains(java.sql.Date.valueOf("2014-05-07")))
    assert(out("2014-05-07 10:30")
      .contains(java.sql.Date.valueOf("2014-05-07")))
    assert(out("NA").isEmpty)
    assert(out("05/07/2014").isEmpty) // not a cascade format
    assert(out("2014-13").isEmpty)    // invalid month
  }

  test("glamr_samples: NA SampleID drops AFTER normalization; " +
    "date_same_year pins to leap-year 2000") {
    val raw = Seq(
        ("samp_1", "2016-02-29", "NF"),
        ("NA", "2014-05", "1.0"))
      .toDF("SampleID", "collection_date", "lat")
    val out = CatalogIngest.glamrSamplesIngest(raw, Seq("lat"))
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("sample") == "samp_1")
    assert(r.getAs[java.sql.Date]("date_same_year") ==
      java.sql.Date.valueOf("2000-02-29")) // 2000 IS a leap year
    assert(r.getAs[Any]("lat") == null)    // NF normalized, not 0
  }

  test("read_count: funnel percents lag within (sample, direction); " +
    "first state null") {
    val raw = Seq(("raw_reads", 1000L, 980L),
        ("deduped_reads", 900L, 880L))
      .toDF("read_state", "fwd_read_count", "rev_read_count")
    val out = CatalogIngest.readCountIngest(raw, "s1")
      .select("direction", "read_state", "percent_retained")
      .as[(String, String, Option[Double])].collect()
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("fwd", "raw_reads")).isEmpty)
    assert(m(("fwd", "deduped_reads")).contains(90.0))
    assert(m(("rev", "deduped_reads"))
      .exists(v => math.abs(v - 880.0 / 980.0 * 100) < 1e-12))
  }

  test("contig_bin_membership: distinct + ingest-sample prefix gate") {
    val out = CatalogIngest.contigBinMembershipIngest(Seq(
        ("c_1", "samp_1", "b_1", 10), ("c_1", "samp_1", "b_1", 10),
        ("c_2", "GVHDsamp_2", "b_2", 20),
        ("c_3", "other_3", "b_3", 30))
      .toDF("contig", "sample", "new_bin_name", "length"))
    assert(out.count() == 2)
    assert(out.filter(col("sample") === "other_3").isEmpty)
  }
}
