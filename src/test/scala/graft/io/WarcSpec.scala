package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.nio.file.{Files, Paths}

/** WARC/WET record framing (ISO 28500): golden parse of the embedded
  * fixture, octet (not char) Content-Length semantics on multi-byte
  * payloads, bare-LF tolerance, file-based read, and the
  * CorpusBuild.fromWarc end-to-end batch. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Production (length-directed) framing. */
  private def parse(text: String) =
    Readers.parseWarcRecords(spark.createDataset(Seq(text)))

  /** Regex oracle twin — only for the agreement/divergence pins. */
  private def parseRegex(text: String) =
    Readers.parseWarcText(spark.createDataset(Seq(text)))

  test("fixture parses to 7 framed records with exact payload cuts") {
    val rows = parse(Fixtures.warc).collect()
    assert(rows.length == 7)
    val byId = rows.map(r => r.getAs[String]("record_id") -> r).toMap

    val wi = byId("urn:uuid:wi-0001")
    assert(wi.getAs[String]("warc_type") == "warcinfo")
    assert(wi.getAs[Boolean]("is_valid"))
    // payload cut exactly at Content-Length: the record separator's
    // trailing blank lines must NOT leak into the payload
    assert(wi.getAs[String]("payload") == "software: graft-test")

    val a = byId("urn:uuid:wet-0001")
    assert(a.getAs[String]("url") == "http://example.com/a")
    assert(a.getAs[String]("payload") ==
      "The quick brown fox jumps over the lazy dog")
    assert(a.getAs[java.sql.Timestamp]("warc_date").toInstant ==
      java.time.Instant.parse("2026-08-01T01:02:03Z"))

    // the response record's payload itself contains a CRLF blank line
    // — only the FIRST blank line (end of WARC headers) frames it
    val resp = byId("urn:uuid:resp-0001")
    assert(resp.getAs[String]("warc_type") == "response")
    assert(resp.getAs[String]("payload") ==
      "HTTP/1.1 200 OK\r\n\r\nraw http body here")

    // malformed probes: kept, flagged, payload withheld
    val noLen = byId("urn:uuid:bad-nolen")
    assert(!noLen.getAs[Boolean]("is_valid"))
    assert(noLen.isNullAt(noLen.fieldIndex("content_length")))
    assert(noLen.isNullAt(noLen.fieldIndex("payload")))
    val trunc = byId("urn:uuid:bad-trunc")
    assert(!trunc.getAs[Boolean]("is_valid"))
    assert(trunc.getAs[Long]("content_length") == 999L)
    assert(trunc.isNullAt(trunc.fieldIndex("payload")))
  }

  test("Content-Length counts OCTETS: multi-byte payload cut on " +
    "UTF-8 bytes, not chars") {
    // payload "héllo" = 6 bytes (é is 2), 5 chars. Declaring 6 must
    // keep all 5 chars; a char-based cut would keep only "héllo".drop?
    // — i.e. would wrongly include the following CR. Declaring 4 must
    // cut mid-text at a byte boundary that still decodes ("hél").
    def rec(len: Int) = Seq(
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Record-ID: <urn:uuid:mb-1>",
      "WARC-Target-URI: http://x/",
      "WARC-Date: 2026-08-01T00:00:00Z",
      s"Content-Length: $len",
      "",
      "héllo world",
      "").mkString("\r\n")
    val full = parse(rec(12)).collect()(0) // "héllo world" = 12 bytes
    assert(full.getAs[Boolean]("is_valid"))
    assert(full.getAs[String]("payload") == "héllo world")
    val cut = parse(rec(6)).collect()(0)
    assert(cut.getAs[String]("payload") == "héllo")
    // char semantics would have yielded "héllo " (6 chars) — the
    // octet cut stops after 6 BYTES = 5 chars
  }

  test("bare-LF members (hand-made fixtures) parse identically") {
    val lf = Fixtures.warc.replace("\r\n", "\n")
    val rows = parse(lf).collect()
    assert(rows.length == 7)
    val a = rows.find(
      _.getAs[String]("record_id") == "urn:uuid:wet-0001").get
    assert(a.getAs[String]("payload") ==
      "The quick brown fox jumps over the lazy dog")
    assert(rows.count(_.getAs[Boolean]("is_valid")) == 5)
  }

  test("regex twin and cursor parser agree row-for-row on the " +
    "spec-conforming fixture (the oracle-validity contract)") {
    val cursor = parse(Fixtures.warc).collect()
      .map(_.toSeq).toSet
    val regex = parseRegex(Fixtures.warc).collect()
      .map(_.toSeq).toSet
    assert(cursor == regex)
  }

  test("payload embedding a WARC/1.0 line: cursor framing consumes " +
    "it as payload octets; regex framing mis-frames (the phantom)") {
    val embedded = "page quoting an archive:\r\nWARC/1.0\r\nis text"
    val rec = Seq(
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Record-ID: <urn:uuid:embed-1>",
      "WARC-Target-URI: http://x/warc-article",
      "WARC-Date: 2026-08-01T00:00:00Z",
      s"Content-Length: ${embedded.getBytes("UTF-8").length}",
      "",
      embedded,
      "",
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Record-ID: <urn:uuid:embed-2>",
      "WARC-Target-URI: http://y/",
      "WARC-Date: 2026-08-01T00:00:01Z",
      "Content-Length: 4",
      "",
      "tail",
      "").mkString("\r\n")
    // length-directed: exactly 2 records, both valid, payload intact
    val cur = parse(rec).collect()
    assert(cur.length == 2)
    assert(cur.forall(_.getAs[Boolean]("is_valid")))
    assert(cur.find(_.getAs[String]("record_id") == "urn:uuid:embed-1")
      .get.getAs[String]("payload") == embedded)
    // regex twin: splits INSIDE the payload — the true record is
    // truncated (detectably invalid), and a phantom third "record"
    // (the payload remainder) appears. This is the latent corruption
    // the cursor parser exists to close.
    val rx = parseRegex(rec).collect()
    assert(rx.length == 3)
    assert(!rx.find(_.getAs[String]("record_id") == "urn:uuid:embed-1")
      .get.getAs[Boolean]("is_valid"))
  }

  test("compressed members (.warc.gz) decode transparently through " +
    "readWarc") {
    val dir = Files.createTempDirectory("graft_warc_gz")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("m0.warc.gz")))
    gz.write(Fixtures.warc.getBytes("UTF-8")); gz.close()
    val rows = Readers.readWarc(spark, dir.toString).collect()
    assert(rows.length == 7)
    assert(rows.count(_.getAs[Boolean]("is_valid")) == 5)
    assert(rows.find(
      _.getAs[String]("record_id") == "urn:uuid:wet-0001")
      .get.getAs[String]("payload") ==
      "The quick brown fox jumps over the lazy dog")
  }

  test("STREAMING ingest reads compressed members too: warcStream " +
    "over a .wet.gz file frames the same records as batch") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_warc_gz_stream")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("m0.wet.gz")))
    gz.write(Fixtures.warc.getBytes("UTF-8")); gz.close()
    val ckpt = Files.createTempDirectory("graft_wgz_ckpt").toString
    val q = Readers.parseWarcRecords(
        graft.streaming.Streams.warcStream(spark, dir.toString))
      .writeStream.format("memory").queryName("wgz_stream")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.sql("SELECT * FROM wgz_stream").collect()
    assert(rows.length == 7)
    assert(rows.count(_.getAs[Boolean]("is_valid")) == 5)
  }

  test("member-size guard fails loudly, not as an opaque OOM") {
    val e = intercept[org.apache.spark.SparkException] {
      Readers.parseWarcRecords(
        spark.createDataset(Seq(Fixtures.warc)),
        maxMemberBytes = 64).collect()
    }
    assert(e.getMessage.contains("maxMemberBytes") ||
      Option(e.getCause).exists(
        _.getMessage.contains("maxMemberBytes")))
  }

  test("mixed-charset binary member: byte-faithful framing is " +
    "octet-exact; the UTF-8 String round-trip diverges (pin)") {
    val recs = Readers.frameWarcMember(Fixtures.warcMixed,
      1L << 30).toSeq
    assert(recs.length == 6 && recs.forall(_.isValid))
    val byId = recs.map(r => r.recordId -> r).toMap
    // payload slices are the exact component octets the member was
    // concatenated from — incl. the binary BMP body
    Fixtures.warcMixedRecs.foreach { c =>
      assert(java.util.Arrays.equals(byId(c.id).payload, c.payload),
        c.id)
    }
    // the String path (wholetext decode + UTF-8 re-encode) replaces
    // each invalid sequence (1 byte → 3), so the Content-Length cut
    // drifts — the Latin-1 record's payload can no longer match
    val mangled = new String(Fixtures.warcMixed,
      java.nio.charset.StandardCharsets.UTF_8)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val viaString = Readers.frameWarcMember(mangled, 1L << 30).toSeq
    val latin1 = viaString.find(_.recordId == "urn:uuid:bin-latin1")
    assert(latin1.isEmpty || latin1.get.payload == null ||
      !java.util.Arrays.equals(latin1.get.payload,
        byId("urn:uuid:bin-latin1").payload))
  }

  test("readWarcBinary: revisit frames with an empty payload; " +
    "fromWarcFull's processed frame covers revisits and non-text " +
    "responses the batch skips") {
    val dir = Files.createTempDirectory("graft_warc_bin")
    Files.write(dir.resolve("m0.warc"), Fixtures.warcMixed)
    val parsed = Readers.readWarcBinary(spark, dir.toString)
    val rev = parsed.filter(col("warc_type") === "revisit").collect()
    assert(rev.length == 1)
    assert(rev(0).getAs[Array[Byte]]("payload").length == 0)
    assert(rev(0).getAs[Boolean]("is_valid"))
    val (batch, processed) =
      graft.cli.CorpusBuild.fromWarcFull(spark, dir.toString)
    // batch: the three charset pages (BMP response and revisit have
    // no text; warcinfo is not content)
    assert(batch.count() == 3)
    // processed: ALL valid content-bearing records — 4 responses
    // (3 html + bmp) + 1 revisit — so none re-enters a later cycle
    assert(processed.count() == 5)
    assert(processed.select("doc_uid").distinct().count() == 5)
    // the two serves of the same page decode to identical text: the
    // exact-dup pair the charset decode unlocks
    val texts = batch.select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(texts("http://utf8.example.com/cafe") ==
      texts("http://latin1.example.net/cafe-mirror"))
    assert(texts("http://quotes.example.org/digest")
      .contains("“Budgets aren’t the issue"))
  }

  test("binary BMP response round-trips bit-exact into the image " +
    "decode path") {
    val dir = Files.createTempDirectory("graft_warc_bmp")
    Files.write(dir.resolve("m0.warc"), Fixtures.warcMixed)
    val bmp = Readers.readWarcBinary(spark, dir.toString)
      .filter(col("record_id") === "urn:uuid:bin-bmp")
      .select(lit(7L).as("doc_id"),
        graft.text.Html.httpBodyBytes(
          graft.text.Html.httpCarrier(col("payload"))).as("bmp"))
    val got = bmp.collect()(0).getAs[Array[Byte]]("bmp")
    assert(java.util.Arrays.equals(got, Fixtures.bmpPayload))
    val dec = graft.multimodal.Multimodal.decodeBmp(bmp).collect()(0)
    assert(dec.getAs[Int]("width") == 5 &&
      dec.getAs[Int]("height") == 4)
  }

  test("gzip binary members decode in-stream through readWarcBinary") {
    val dir = Files.createTempDirectory("graft_warc_bin_gz")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("m0.warc.gz")))
    gz.write(Fixtures.warcMixed); gz.close()
    val rows = Readers.readWarcBinary(spark, dir.toString).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Boolean]("is_valid")))
  }

  test("readWarc over a directory of members + fromWarc batch shape") {
    val dir = Files.createTempDirectory("graft_warc")
    Files.writeString(dir.resolve("m0.warc"), Fixtures.warc)
    // second member: same records re-crawled — fromWarc ids must be
    // stable so the incremental seen-gate dedups across runs
    Files.writeString(dir.resolve("m1.warc"),
      Fixtures.warc.replace("wet-0003", "wet-0004"))
    val parsed = Readers.readWarc(spark, dir.toString)
    assert(parsed.count() == 14)

    val batch = graft.cli.CorpusBuild.fromWarc(spark, dir.toString)
    val rows = batch.collect()
    // 3 valid conversions per member; ids hash-stable: the 2 members'
    // shared records collapse to the same doc_id
    assert(rows.length == 6)
    assert(batch.select("doc_id").distinct().count() == 4)
    assert(batch.columns.toSeq ==
      Seq("doc_id", "doc_uid", "text", "lang", "source", "n_chars"))
    // the 128-bit ledger key is composite: both halves present, and
    // as id-stable across re-crawls as doc_id
    assert(batch.select("doc_uid").distinct().count() == 4)
    assert(rows.forall(_.getAs[String]("doc_uid").split(":").length == 2))
    val a = rows.filter(_.getAs[String]("source") == "http://example.com/a")
    assert(a.forall(_.getAs[String]("text") ==
      "The quick brown fox jumps over the lazy dog"))
    assert(a.forall(_.getAs[Long]("n_chars") == 43L))
  }

  test("fromWarc feeds runBatch end-to-end: curated store from raw " +
    "archive bytes") {
    val dir = Files.createTempDirectory("graft_warc_e2e")
    // need payloads long/clean enough to clear the quality floor —
    // synthesize 20 WET records of plain prose, two of them duplicates
    def wet(i: Int, text: String) = Seq(
      "WARC/1.0",
      "WARC-Type: conversion",
      s"WARC-Record-ID: <urn:uuid:e2e-$i>",
      s"WARC-Target-URI: http://site$i.example.com/page",
      "WARC-Date: 2026-08-02T00:00:00Z",
      s"Content-Length: ${text.getBytes("UTF-8").length}",
      "",
      text,
      "").mkString("\r\n")
    // quality = min(1, nTok/100)·(1−stopFrac): 120 distinct
    // non-stopword tokens per doc clears the 0.5 floor at 1.0
    def body(i: Int) =
      (0 until 120).map(j => s"w${i}x$j").mkString(" ")
    val prose = (0 until 18).map(i => wet(i, body(i))) ++
      Seq(wet(18, body(0)), wet(19, body(1)))
    Files.writeString(dir.resolve("m0.warc"), prose.mkString(""))
    val wh = Files.createTempDirectory("graft_warc_wh").toString
    graft.cli.CorpusBuild.runBatch(spark,
      graft.cli.CorpusBuild.fromWarc(spark, dir.toString), wh)
    val store = spark.read.parquet(s"$wh/corpus")
    val n = store.count()
    assert(n > 0 && n <= 18) // the 2 exact re-crawl dups never land
    assert(store.groupBy("fp").count().filter(col("count") > 1)
      .count() == 0)
    // doc 18 duplicates doc 0's text exactly — exact dedup keeps 1
    assert(store.filter(col("text").contains("w0x119")).count() == 1)
  }
}
