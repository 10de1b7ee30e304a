package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.nio.file.Files

/** HTML → text extraction: block reconstruction, entity decode,
  * script/style/comment removal, link-density pruning, HTTP dispatch,
  * and the CorpusBuild raw-HTML-to-curated-store end-to-end. */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def blocksOf(html: String) =
    Html.extractBlocks(
      Seq((1L, html)).toDF("doc_id", "html"), "html", Seq("doc_id"))
      .orderBy("block_idx").collect()

  test("script/style/comments vanish wholesale; block tags frame; " +
    "inline tags strip; entities decode") {
    val html = Seq(
      "<html><head><title>T &amp; U</title>",
      "<style>a { x: 1; }</style>",
      "<script>var s = \"<p>never text</p>\";</script></head><body>",
      "<p>One &lt;tag&gt; and &quot;q&quot; and it&#39;s" +
        "&nbsp;done with <b>bold</b> words.</p>",
      "<!-- gone -->",
      "</body></html>").mkString("\n")
    val rows = blocksOf(html)
    assert(rows.map(_.getAs[String]("text")).toSeq == Seq(
      "T & U",
      "One <tag> and \"q\" and it's done with bold words."))
    assert(rows.forall(_.getAs[Int]("anchor_chars") == 0))
  }

  test("link-density prune: anchor-majority chrome drops, prose " +
    "with an inline link survives, integer boundary is exact") {
    val html = Seq(
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">Other</a></nav>",
      "<p>A sentence long enough that its " +
        "<a href=\"/l\">small link</a> does not dominate.</p>",
      // text 10 chars, anchor 10 → 10*2 > 10*1 → dropped
      "<p><a href=\"/y\">exactlyten</a></p>",
      // anchor 5 vs text 11: 5*2=10 <= 11 → kept (boundary)
      "<p><a href=\"/z\">fives</a> sixsix</p>").mkString("\n")
    val texts = blocksOf(html).map(_.getAs[String]("text")).toSeq
    assert(texts == Seq(
      "A sentence long enough that its small link does not dominate.",
      "fives sixsix"))
  }

  test("httpBody cuts the header block only when the payload is an " +
    "HTTP message; httpContentType reads the header, not the body") {
    val df = Seq(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>b</p>",
        "html"),
      ("plain, not http", "raw")).toDF("payload", "tag")
      .withColumn("body", Html.httpBody(col("payload")))
      .withColumn("ct", Html.httpContentType(col("payload")))
    val m = df.collect().map(r =>
      r.getAs[String]("tag") ->
        (r.getAs[String]("body"), r.getAs[String]("ct"))).toMap
    assert(m("html") == ("<p>b</p>", "text/html"))
    assert(m("raw") == ("plain, not http", ""))
  }

  test("numeric character references decode: decimal, hex (both " +
    "cases), nbsp normalization; out-of-range forms stay literal") {
    val html = "<p>caf&#233; and caf&#xE9; and a&#160;b and " +
      "it&#X27;s &#8212; also &#7; &#xD800; &#999999; stay</p>"
    val texts = blocksOf(html).map(_.getAs[String]("text")).toSeq
    assert(texts == Seq("café and café and a b and it's — also " +
      "&#7; &#xD800; &#999999; stay"))
  }

  test("interim 1xx blocks are skipped and folded headers unfolded " +
    "before Content-Type dispatch") {
    val payload = "HTTP/1.1 100 Continue\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Type: text/html;\r\n" +
      " charset=UTF-8\r\nServer: x\r\n\r\n<p>real body</p>"
    val row = Seq(Tuple1(payload)).toDF("payload")
      .select(Html.httpContentType(col("payload")).as("ct"),
        Html.httpBody(col("payload")).as("body"),
        Html.charsetOf(Html.httpContentType(col("payload")))
          .as("cs"))
      .collect()(0)
    assert(row.getAs[String]("ct") == "text/html; charset=UTF-8")
    assert(row.getAs[String]("cs") == "utf-8")
    assert(row.getAs[String]("body") == "<p>real body</p>")
  }

  test("decodeBytes: declared Latin-1 and Windows-1252 decode " +
    "exactly; a mis-declared UTF-8 payload falls to the 1252 sniff") {
    val latin1 = "résumé café".getBytes("ISO-8859-1")
    val win = "it’s – “quoted” €9".getBytes("windows-1252")
    val df = Seq(
      ("a", latin1, "iso-8859-1"),
      ("b", win, "windows-1252"),
      ("c", "plain ascii".getBytes("US-ASCII"), ""),
      // declared utf-8 but actually 1252 bytes → sniff fallback
      ("d", "it’s fine".getBytes("windows-1252"), "utf-8"))
      .toDF("k", "payload", "cs")
      .select(col("k"),
        Html.decodeBytes(col("payload"), col("cs")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(df("a") == "résumé café")
    assert(df("b") == "it’s – “quoted” €9")
    assert(df("c") == "plain ascii")
    assert(df("d") == "it’s fine")
  }

  test("extractText reassembles blocks in order with newline joins") {
    val html = "<h1>Head</h1><p>First para.</p><p>Second para.</p>"
    val doc = Html.extractText(
      Seq((7L, html)).toDF("doc_id", "html"), "html", Seq("doc_id"))
      .collect()(0)
    assert(doc.getAs[String]("text") ==
      "Head\nFirst para.\nSecond para.")
    assert(doc.getAs[Long]("n_blocks") == 3L)
    assert(doc.getAs[Long]("n_chars") ==
      "Head\nFirst para.\nSecond para.".length.toLong)
  }

  test("fromWarc dispatches: WET conversions pass through, HTML " +
    "responses are extracted, non-HTML responses are skipped") {
    val dir = Files.createTempDirectory("graft_html_warc")
    Files.writeString(dir.resolve("m0.warc"),
      graft.io.Fixtures.warcHtml)
    val batch = graft.cli.CorpusBuild.fromWarc(spark, dir.toString)
    val rows = batch.collect()
    // 1 conversion + 5 html responses; json response + warcinfo skip
    assert(rows.length == 6)
    val bySource = rows.map(r =>
      r.getAs[String]("source") -> r.getAs[String]("text")).toMap
    // the mirror page (same content blocks, different chrome)
    // extracts to EXACTLY the original's text — the dedupable form
    assert(bySource("http://mirror.example.net/article-copy") ==
      bySource("http://example.com/article"))
    // the numeric-entity serve (&#38; / &#x22; / &#160;) decodes to
    // the SAME text — the round-17 entity-decode collapse
    assert(bySource("http://numents.example.org/article-ent") ==
      bySource("http://example.com/article"))
    // the interim+folded-header page still dispatched as text/html
    assert(bySource("http://folded.example.com/interim")
      .contains("must not hide this prose"))
    assert(bySource("http://example.com/article")
      .contains("Widgets & Gears Catalog"))
    // no markup survives ("3 < 5" from &lt; is DATA, not markup)
    assert(!bySource("http://example.com/article")
      .matches("(?s).*</?[a-zA-Z].*"))
    assert(!bySource("http://example.com/article").contains("Privacy"))
    assert(bySource("http://partners.example.org/dir") ==
      "Partner directory\nSee also our many more links page.")
    assert(bySource.contains("http://example.com/article"))
    assert(rows.forall(r =>
      r.getAs[Long]("n_chars") == r.getAs[String]("text").length))
  }

  test("raw HTML responses curate end-to-end into the corpus store") {
    // synthesize HTML pages whose prose clears the quality floor
    // (120 distinct non-stopword tokens), one a boilerplate-wrapped
    // duplicate of another — extraction must make the dup EXACT so
    // the fingerprint dedup collapses it
    def prose(i: Int) =
      (0 until 120).map(j => s"h${i}w$j").mkString(" ")
    def page(i: Int, body: String) = Seq(
      "<html><head><title>Doc</title>",
      "<script>var x = 1;</script></head><body>",
      s"<nav><a href='/'>Home</a> <a href='/$i'>Self</a></nav>",
      s"<p>$body</p>",
      "<footer><a href='/t'>Terms</a></footer></body></html>")
      .mkString("\n")
    def rec(i: Int, html: String) = {
      val payload = "HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html\r\n\r\n" + html
      Seq("WARC/1.0", "WARC-Type: response",
        s"WARC-Record-ID: <urn:uuid:he2e-$i>",
        s"WARC-Target-URI: http://h$i.example.com/",
        "WARC-Date: 2026-08-10T00:00:00Z",
        "Content-Type: application/http;msgtype=response",
        s"Content-Length: ${payload.getBytes("UTF-8").length}",
        "", payload, "").mkString("\r\n")
    }
    val pages = (0 until 10).map(i => rec(i, page(i, prose(i)))) :+
      rec(10, page(10, prose(0))) // same prose, different chrome
    val dir = Files.createTempDirectory("graft_html_e2e")
    Files.writeString(dir.resolve("m0.warc"), pages.mkString(""))
    val wh = Files.createTempDirectory("graft_html_wh").toString
    graft.cli.CorpusBuild.runBatch(spark,
      graft.cli.CorpusBuild.fromWarc(spark, dir.toString), wh)
    val store = spark.read.parquet(s"$wh/corpus")
    // the chrome-variant duplicate must collapse: ≤ 10 docs, and the
    // shared prose appears exactly once
    assert(store.count() <= 10)
    assert(store.filter(col("text").contains("h0w119")).count() == 1)
    // extraction left no markup in the store
    assert(store.filter(col("text").contains("<")).count() == 0)
  }
}
