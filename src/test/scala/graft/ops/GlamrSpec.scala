package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** §5 domain goldens on reference-shaped fixtures (F1/F4/F7) with
  * hand-computed expected values. */
class GlamrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F1 read-count funnel: percentages telescope, hand values match") {
    val rc = Seq(
      ("samp_1", "raw_reads", 1000L, 1000L),
      ("samp_1", "deduped_reads", 800L, 790L),
      ("samp_1", "filt_and_trimmed_reads", 400L, 395L),
      ("samp_1", "decon_reads", 100L, 99L),
      ("samp_2", "raw_reads", 500L, 500L),
      ("samp_2", "deduped_reads", 250L, 250L),
      ("samp_2", "filt_and_trimmed_reads", 125L, 125L),
      ("samp_2", "decon_reads", 25L, 20L)
    ).toDF("sample", "read_state", "fwd_read_count", "rev_read_count")
    val out = Glamr.readCountFunnel(rc)
    val fwd1 = out.filter(col("sample") === "samp_1" &&
      col("direction") === "fwd").orderBy("state_rank")
      .select("percent_retained").as[Option[Double]].collect()
    assert(fwd1.toSeq == Seq(None, Some(80.0), Some(50.0), Some(25.0)))
    // telescope: product of retained ratios = last/first
    val ratios = fwd1.flatten.map(_ / 100.0)
    assert(math.abs(ratios.product - 100.0 / 1000.0) < 1e-9)
    val rev2 = out.filter(col("sample") === "samp_2" &&
      col("direction") === "rev").orderBy("state_rank")
      .select("percent_removed").as[Option[Double]].collect()
    assert(rev2.toSeq == Seq(None, Some(50.0), Some(50.0), Some(84.0)))
  }

  test("unknown read states are dropped, not ranked below raw_reads") {
    val rc = Seq(
      ("samp_1", "qc_reads", 900L, 900L), // stray state
      ("samp_1", "raw_reads", 1000L, 1000L),
      ("samp_1", "deduped_reads", 800L, 800L)
    ).toDF("sample", "read_state", "fwd_read_count", "rev_read_count")
    val out = Glamr.readCountFunnel(rc)
    assert(out.filter(col("read_state") === "qc_reads").count() == 0)
    // raw_reads stays the baseline: its percent_retained is null
    val raw = out.filter(col("read_state") === "raw_reads" &&
      col("direction") === "fwd").head
    assert(raw.getAs[Any]("percent_retained") == null)
  }

  test("F4 coverM rename map + TPM self-consistency") {
    val raw = Seq(
      ("s1", "c1", 2.0, 1.9, 900L, 0.1, 1000L, 100L, 0.1, 5.0, 400000.0),
      ("s1", "c2", 4.0, 3.8, 950L, 0.2, 2000L, 300L, 0.15, 7.5, 600000.0),
      ("s2", "c1", 1.0, 1.0, 500L, 0.0, 1000L, 50L, 0.05, 2.0, 1000000.0)
    ).toDF("Sample", "Contig", "Mean", "Trimmed Mean", "Covered Bases",
      "Variance", "Length", "Read Count", "Reads per base", "RPKM", "TPM")
    val df = Glamr.renameCoverm(raw)
    assert(df.columns.toSet.contains("trimmed_mean"))
    assert(df.columns.toSet.contains("reads_per_base"))
    // golden: Σ TPM per sample = 1e6 (F4 self-consistency)
    val bad = df.groupBy("sample").agg(sum("tpm").as("s"))
      .filter(abs(col("s") - 1e6) > 1e-6).count()
    assert(bad == 0)
  }

  test("F7 bracken merge: refseq bacterial rows dropped at EVERY rank, " +
    "matrices fill 0") {
    val tagged = Seq(
      // sample, db, taxonomy_id, name, taxonomy, new_est_reads
      ("s1", "gtdb", 100, "g__Alpha", "d__Bacteria;g__Alpha", 60L),
      ("s1", "gtdb", 200, "g__Beta", "d__Bacteria;g__Beta", 40L),
      ("s2", "gtdb", 100, "g__Alpha", "d__Bacteria;g__Alpha", 10L),
      // domain-level refseq row: filtered
      ("s1", "refseq", 2, "d__Bacteria", "d__Bacteria", 999L),
      // genus-level refseq row under d__Bacteria: ALSO filtered
      // (merge_bracken.R:62-63 matches the full taxonomy, not the name)
      ("s1", "refseq", 400, "g__Delta", "d__Bacteria;g__Delta", 50L),
      // refseq outside Bacteria/Archaea: kept
      ("s2", "refseq", 300, "g__Gamma", "d__Viruses;g__Gamma", 90L)
    ).toDF("sample", "db", "taxonomy_id", "name", "taxonomy",
      "new_est_reads")
    val (counts, rel) = Glamr.brackenMerge(tagged, Seq("s1", "s2"))
    val c = counts.orderBy("taxon").collect()
      .map(r => (r.getAs[String]("taxon"), r.getAs[Long]("s1"),
        r.getAs[Long]("s2"))).toSeq
    assert(c == Seq(
      ("gtdb_100", 60L, 10L),
      ("gtdb_200", 40L, 0L), // fill 0
      ("refseq_300", 0L, 90L)))
    // rel_abund: s1 total=100 (refseq row dropped), s2 total=100
    val r = rel.collect().map(x => x.getAs[String]("taxon") ->
      (x.getAs[Double]("s1"), x.getAs[Double]("s2"))).toMap
    assert(r("gtdb_100") == ((0.6, 0.1)))
    assert(r("gtdb_200") == ((0.4, 0.0)))
    assert(r("refseq_300") == ((0.0, 0.9)))
  }
}
