package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spot-count check: paired doubling, mismatches, unknown runs") {
    val counts = Seq(
      ("SRR1", 3000L), // PAIRED 1500 spots → 3000 reads: ok
      ("SRR2", 800L),  // SINGLE 800 spots: ok
      ("SRR3", 900L),  // PAIRED 500 spots → expected 1000: MISMATCH
      ("SRR9", 100L)   // not in runinfo: flagged
    ).toDF("run", "n_reads")
    val runinfo = Seq(
      ("SRR1", "PAIRED", 1500L),
      ("SRR2", "SINGLE", 800L),
      ("SRR3", "PAIRED", 500L)
    ).toDF("run", "library_layout", "spots")
    val bad = Checks.spotCountMismatches(counts, runinfo)
      .select("run").as[String].collect().toSet
    assert(bad == Set("SRR3", "SRR9"))
  }

  test("paired-model check: agreement passes, disagreement/missing flag") {
    val winners = Seq(
      ("s1", "fwd", "16S"), ("s1", "rev", "16S"), // ok
      ("s2", "fwd", "16S"), ("s2", "rev", "18S"), // disagree
      ("s3", "fwd", "16S"),                       // missing rev
      ("s4", "fwd", "16S"),
      ("s4", "rev", null.asInstanceOf[String])    // side with no model
    ).toDF("sample", "direction", "model")
    val bad = Checks.pairedModelDisagreements(winners)
      .collect().map(r => r.getAs[String]("sample") ->
        r.getAs[String]("models")).toMap
    assert(bad.keySet == Set("s2", "s3", "s4"))
    assert(bad("s2") == "16S,18S")
  }

  test("pairing codes E1-E17: one fixture sample per code path") {
    val out = Checks.pairingCodes(
        Checks.fixtureSummaries(spark), Checks.fixtureFiles(spark))
      .as[(String, String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    val expected = Map(
      "samp02_e1" -> Seq("E1"),
      "samp03_e2" -> Seq("E2"),
      "samp04_e3" -> Seq("E3"),
      "samp05_e4" -> Seq("E4"),
      "samp06_e5" -> Seq("E5"),
      "samp07_e6" -> Seq("E6"),
      "samp08_e7" -> Seq("E7"),
      "samp09_e8" -> Seq("E8"),
      "samp10_e9" -> Seq("E9"),
      "samp11_e10" -> Seq("E10"),
      "samp14_se3" -> Seq("E3"),
      "samp15_se9" -> Seq("E9"),
      "samp16_noaln" -> Seq("E9"),
      // file-level errors abort the summary checks entirely —
      // samp17's E1-worthy ratio must NOT surface
      "samp17_e15" -> Seq("E15"),
      "samp18_e16" -> Seq("E16"),
      "samp19_e17" -> Seq("E17"),
      "samp20_multi" -> Seq("E1", "E5", "E7"))
    assert(out == expected)
    // clean, swapped-but-consistent, and clean-single samples are absent
    assert(!out.contains("samp01_ok"))
    assert(!out.contains("samp12_swap"))
    assert(!out.contains("samp13_sok"))
  }

  test("pairing codes: E4 model mismatch still runs primer checks") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    // models disagree AND fwd primer count is low → E4 + E5 together
    // (check_paired appends E4 and continues, guess_target.py:341-344)
    val summ = spark.createDataFrame(Seq(
      Row("sX", "fwd", "16S", 900L, 1000L, "fwd", "f27", null, 50L,
        null, 5.0, null),
      Row("sX", "rev", "18S", 950L, 1000L, "rev", null, "r338", null,
        400L, null, -3.0)).asJava, Checks.pairingSummarySchema)
    val files = spark.createDataFrame(Seq(
      Row("sX", 2, Integer.valueOf(2), java.lang.Boolean.TRUE)).asJava,
      Checks.pairingFilesSchema)
    val codes = Checks.pairingCodes(summ, files)
      .select("code").as[String].collect().sorted.toSeq
    assert(codes == Seq("E4", "E5"))
  }

  test("pairing codes: blocked side suppresses pair checks, other side still collects") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    // rev side has no alignments (E9-insufficient, blocks the pair
    // check) while fwd side has a bad ratio → E1(fwd) + E9(rev), but
    // no primer-level codes even though fwd_count is low
    val summ = spark.createDataFrame(Seq(
      Row("sY", "fwd", "16S", 100L, 1000L, "fwd", "f27", null, 10L,
        null, 5.0, null),
      Row("sY", "rev", "16S", null, null, "rev", null, "r338", null,
        400L, null, -3.0)).asJava, Checks.pairingSummarySchema)
    val files = spark.createDataFrame(Seq(
      Row("sY", 2, Integer.valueOf(2), java.lang.Boolean.TRUE)).asJava,
      Checks.pairingFilesSchema)
    val codes = Checks.pairingCodes(summ, files)
      .select("code").as[String].collect().sorted.toSeq
    assert(codes == Seq("E1", "E9"))
  }

  test("table checksum: invariant to row order and partitioning") {
    val rows = Seq((1L, "a"), (2L, "b"), (3L, null))
    def sum(df: org.apache.spark.sql.DataFrame) =
      Checks.tableChecksum(df, Seq("k", "v"))
        .as[(Long, String)].head()
    val base = sum(rows.toDF("k", "v"))
    assert(base._1 == 3L)
    assert(sum(rows.reverse.toDF("k", "v").repartition(7)) == base)
    assert(sum(rows.toDF("k", "v").repartition(1)) == base)
  }

  test("table checksum: detects a single changed/extra row") {
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b = Seq((1L, "a"), (2L, "B")).toDF("k", "v")
    def cs(df: org.apache.spark.sql.DataFrame) =
      Checks.tableChecksum(df, Seq("k", "v"))
        .as[(Long, String)].head()
    assert(cs(a) != cs(b))
    assert(cs(a) != cs(a.union(a.limit(1))))
  }

  test("table checksum: empty table is (0, \"0\")") {
    val e = Seq.empty[(Long, String)].toDF("k", "v")
    assert(Checks.tableChecksum(e, Seq("k", "v"))
      .as[(Long, String)].head() == ((0L, "0")))
  }

  test("bucket checksums: refine the table checksum and localize a diff") {
    val rows = (1L to 40L).map(k => (k, s"v$k"))
    val a = rows.toDF("k", "v")
    val buckets = Checks.bucketChecksums(a, Seq("k", "v"), "k", 8)
      .as[(Int, Long, String)].collect()
    assert(buckets.length == 8 && buckets.map(_._2).sum == 40L)
    // Σ bucket digests == whole-table digest (same commutative sum)
    val whole = BigInt(Checks.tableChecksum(a, Seq("k", "v"))
      .as[(Long, String)].head()._2)
    assert(buckets.map(b => BigInt(b._3)).sum == whole)
    // mutate ONE row → exactly one bucket's checksum moves
    val b = rows.map { case (k, v) =>
      (k, if (k == 13L) "CHANGED" else v) }.toDF("k", "v")
    val after = Checks.bucketChecksums(b, Seq("k", "v"), "k", 8)
      .as[(Int, Long, String)].collect().map(r => r._1 -> r._3).toMap
    val before = buckets.map(r => r._1 -> r._3).toMap
    val moved = before.keySet.filter(k => before(k) != after(k))
    assert(moved == Set((13 % 8).toInt))
  }

  private def drift(rows: Seq[(String, Int)]): Map[String,
      (Long, Long, String, Option[Double])] =
    Checks.distributionDrift(rows.toDF("cat", "side"), "cat", "side")
      .select("category", "n_a", "n_b", "drift_num", "tv_contrib")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap

  test("distribution drift: hand TV contributions, one-sided " +
    "categories carry their full mass") {
    // A: {x:3, y:1} N=4; B: {x:1, y:1, z:2} N=4 → TV = 0.5
    val m = drift(Seq.fill(3)(("x", 0)) ++ Seq(("y", 0)) ++
      Seq(("x", 1), ("y", 1), ("z", 1), ("z", 1)))
    assert(m("x") == ((3L, 1L, "8", Some(0.25))))
    assert(m("y") == ((1L, 1L, "0", Some(0.0))))
    assert(m("z") == ((0L, 2L, "8", Some(0.25))))
    assert(m.values.flatMap(_._4).sum == 0.5)
  }

  test("distribution drift: identical mixes are all-zero; an empty " +
    "side yields NULL shares but exact numerators") {
    val same = drift(Seq(("x", 0), ("x", 1), ("y", 0), ("y", 1)))
    assert(same.values.forall(v => v._3 == "0" && v._4 == Some(0.0)))
    val oneSided = drift(Seq(("x", 0), ("y", 0)))
    assert(oneSided.values.forall(_._4.isEmpty))
  }

  test("distribution drift: out-of-domain side values fail loudly " +
    "instead of silently vanishing from both counts") {
    val e = intercept[Exception] {
      drift(Seq(("x", 0), ("x", 2)))
    }
    assert(e.getMessage.contains("side column"), e.getMessage)
  }
}
