package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Golden tests for the text-format readers over the embedded fixtures
  * (FIXTURES.md F2/F10/F11) — hand-computed expected values. */
class ReadersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("FASTA: 5 records, wrapped+lowercase sequences, GC% correct") {
    val out = Readers.parseFastaText(
      spark.createDataset(Seq(Fixtures.fasta)))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 5)
    val byId = rows.map(r => r.getAs[String]("id") ->
      (r.getAs[String]("seq"), r.getAs[Int]("length"),
        r.getAs[Double]("gc_pct"))).toMap
    // ACGTACGTGGCC: 8 G/C of 12 → 66.6667
    assert(byId("k141_1") == (("ACGTACGTGGCC", 12, 66.6667)))
    // wrapped + lowercase: acgtacgt (4 GC) + GGCCGGCC (8) → 12/16 = 75
    assert(byId("k141_2")._2 == 16)
    assert(byId("k141_2")._3 == 75.0)
    assert(byId("NODE_2_length_8_cov_1.0") == (("GGGGCCCC", 8, 100.0)))
    assert(byId("plain_contig")._3 == 0.0)
    // description preserved (megahit header fields)
    val desc = rows.find(_.getAs[String]("id") == "k141_1").get
      .getAs[String]("desc")
    assert(desc == "flag=1 multi=2.0000 len=12")
  }

  test("FASTQ: 4 records incl. quality line starting with '@'") {
    val out = Readers.parseFastq(
      spark.createDataset(Fixtures.fastq.split("\n").toSeq))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 4)
    val r12 = rows.find(_.getAs[String]("id") == "TEST1/2").get
    assert(r12.getAs[String]("seq") == "TGCATGCA")
    assert(r12.getAs[String]("qual") == "@IIIIIII")
    assert(r12.getAs[Int]("length") == 8)
  }

  test("tblout: comments skipped, types cast, multiword description") {
    val out = Readers.parseTblout(
      spark.createDataset(Fixtures.tblout.split("\n").toSeq))
    assert(out.count() == 8)
    val r1 = out.filter(col("target_name") === "16S_rRNA" &&
      col("query_name") === "read_001").head
    assert(r1.getAs[Int]("hmmfrom") == 1)
    assert(r1.getAs[Int]("hmm_to") == 120)
    assert(r1.getAs[String]("strand") == "+")
    assert(math.abs(r1.getAs[Double]("score") - 95.5) < 1e-9)
    assert(r1.getAs[String]("description") == "best hit forward")
    assert(out.filter(col("strand") === "-").count() == 2)
  }

  test("m8 tophit: best e-value wins, tie broken by sseqid") {
    val out = graft.SparkEntry.queries("s1_m8_tophit")(spark, "")
      .collect().map(r => r.getAs[String]("qseqid") ->
        r.getAs[String]("sseqid")).toMap
    assert(out == Map(
      "gene_1" -> "UniRef100_A1",
      "gene_2" -> "UniRef100_B1", // tie 2.0e-30: B1 < B2
      "gene_3" -> "UniRef100_C1"))
  }

  test("malformed tblout/m8 lines yield nulls, not ANSI aborts") {
    val badTblout = Seq(
      "short line",
      "16S_rRNA RF00177 read_x - 1 notanint 5 124 1 130 150 + 1.2e-30 95.5 0.1 desc here")
    val t = Readers.parseTblout(spark.createDataset(badTblout)).collect()
    assert(t.length == 2) // no abort
    assert(t.forall(_.getAs[String]("target_name") != null))
    // short line: numeric fields null; bad int → null, neighbors parse
    assert(t.exists(r => r.getAs[Any]("hmm_to") == null))
    val badM8 = Seq("gene_x\tnotanint\tS1")
    val m = Readers.parseM8(spark.createDataset(badM8)).collect()
    assert(m.length == 1)
    assert(m.head.getAs[Any]("qlen") == null) // bad int
    assert(m.head.getAs[Any]("evalue") == null) // missing col
    assert(m.head.getAs[String]("qseqid") == "gene_x")
  }

  test("json runinfo parse: layouts + missing optional field") {
    val out = graft.SparkEntry.queries("s8_json_parse")(spark, "")
      .collect().map(r => r.getAs[String]("run") ->
        (r.getAs[Boolean]("is_paired"), r.getAs[Any]("bases"))).toMap
    assert(out("SRR000001") == ((true, 450000L)))
    assert(out("SRR000002") == ((false, 120000L)))
    assert(out("SRR000003")._2 == null) // missing optional field
  }

  test("fastq interleave checker flags broken pairs") {
    val broken = Fixtures.fastq.split("\n").toSeq ++ Seq(
      "@TEST3/1", "ACGT", "+", "IIII",
      "@TEST4/2", "TGCA", "+", "IIII") // mismatched pair
    val fq = Readers.parseFastq(spark.createDataset(broken))
    assert(Readers.checkInterleave(fq).count() == 1)
    // pairing must key on the rec index, not row order: a scrambled
    // row order (repartition) must not change the verdict
    assert(Readers.checkInterleave(fq.repartition(7)).count() == 1)
    val valid = Readers.parseFastq(
      spark.createDataset(Fixtures.fastq.split("\n").toSeq))
    assert(Readers.checkInterleave(valid.repartition(5)).count() == 0)
  }

  test("file catalog recovers table names from paths") {
    val cat = Readers.fileCatalog(spark, TestSpark.sf0001)
    assert(cat.filter(col("is_parquet")).count() == 10)
    assert(cat.filter(col("table_name") === "lineitem").count() == 1)
    // file.info stat columns (postgres.Rmd:2114-2126 idiom): every
    // listed file has a positive size and a non-null mtime
    assert(cat.filter(col("size_bytes") <= 0).count() == 0)
    assert(cat.filter(col("mtime").isNull).count() == 0)
    // missing dir → empty catalog, not an error
    assert(Readers.fileCatalog(spark, "/no/such/dir").count() == 0)
  }

  test("S4 skipLines drops exactly the first N file-order lines") {
    val in = spark.createDataset(Fixtures.rpkm.split("\n").toSeq)
    val body = Readers.skipLines(in, 4).collect()
    assert(body.length == 5)
    assert(body.head.startsWith("#Name")) // the table header survives
    assert(body.last.startsWith("gene_four"))
  }

  test("S7 seqkit stats: header recognized, text cols verbatim, numerics typed") {
    val out = Readers.parseSeqkitStats(
      spark.createDataset(Fixtures.seqkitStats.split("\n").toSeq))
    assert(out.count() == 3) // header row excluded
    val r = out.filter(col("file") === "samp_1_fwd.fastq").collect()(0)
    assert(r.getAs[String]("format") == "FASTQ")
    assert(r.getAs[Long]("num_seqs") == 1000L)
    assert(r.getAs[Double]("avg_len") == 150.0)
    assert(r.getAs[Double]("q2") == 150.0)   // guess_target's median
    assert(r.getAs[Double]("gc_pct") == 51.25)
  }

  test("S13 idxstats: name cleanup, '*' bucket dropped unless kept") {
    val in = spark.createDataset(Fixtures.idxstats.split("\n").toSeq)
    val out = Readers.parseIdxstats(in).collect()
    assert(out.length == 3)
    val names = out.map(_.getAs[String]("seqnames")).toSet
    // ;-suffix stripped and '-' → '_' (R lines 50-52)
    assert(names == Set("marker_A", "marker_B", "marker_C"))
    assert(out.find(_.getAs[String]("seqnames") == "marker_A").get
      .getAs[Long]("mapped") == 120L)
    // unmapped bucket retained on request
    assert(Readers.parseIdxstats(in, dropUnmapped = false)
      .count() == 4)
  }

  test("S3 csv reader honors the comma separator") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("genome_info.csv")
    java.nio.file.Files.writeString(f,
      "genome,completeness,contamination\nbin_1.fa,98.5,1.2\nbin_2.fa,77.0,4.5\n")
    val schema = StructType(Seq(
      StructField("genome", StringType),
      StructField("completeness", DoubleType),
      StructField("contamination", DoubleType)))
    val out = Readers.csv(spark, f.toString, schema)
    assert(out.count() == 2)
    assert(out.filter(col("genome") === "bin_1.fa").collect()(0)
      .getAs[Double]("completeness") == 98.5)
  }
}
