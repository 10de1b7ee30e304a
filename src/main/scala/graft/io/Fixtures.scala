package graft.io

/** Embedded micro-fixtures for the text-record formats (FIXTURES.md
  * F2/F10/F11) — used by both the gate queries (the driver's sfDir has
  * no FASTA/FASTQ/tblout files) and the ScalaTest goldens. Shapes match
  * the reference's own outputs; values are synthetic. */
object Fixtures {

  /** F11: 5 contigs — lowercase, line-wrapped, megahit- and
    * metaSpades-style headers (reference `rename_contigs.R:57-82`). */
  val fasta: String =
    """>k141_1 flag=1 multi=2.0000 len=12
      |ACGTACGTGGCC
      |>k141_2 flag=0 multi=1.5000 len=16
      |acgtacgt
      |GGCCGGCC
      |>NODE_1_length_20_cov_2.5
      |ACGTACGTACGTACGTACGT
      |>NODE_2_length_8_cov_1.0
      |GGGGCCCC
      |>plain_contig
      |ATATATAT
      |""".stripMargin

  /** F11: 8 paired reads, @TESTn accessions (reference
    * `pypelib/utils.py:378,392`), one quality line starting with '@'. */
  val fastq: String =
    """@TEST1/1
      |ACGTACGT
      |+
      |IIIIIIII
      |@TEST1/2
      |TGCATGCA
      |+
      |@IIIIIII
      |@TEST2/1
      |AAAACCCC
      |+
      |IIIIHHHH
      |@TEST2/2
      |GGGGTTTT
      |+
      |HHHHIIII
      |""".stripMargin

  /** F10: nhmmscan tblout — '#' comments, +/- strands, sub-threshold
    * score, tied top scores across models, multi-word description. */
  val tblout: String =
    """#                                                               --- full sequence ---
      |# target name        accession  query name           accession  hmmfrom hmm to alifrom ali to envfrom env to  sq len strand   E-value  score  bias  description of target
      |#------------------- ---------- -------------------- ---------- ------- ------ ------- ------ ------- ------ ------- ------ --------- ------ ----- ---------------------
      |16S_rRNA             RF00177    read_001             -                1    120       5    124       1    130     150      +   1.2e-30   95.5   0.1  best hit forward
      |18S_rRNA             RF01960    read_001             -               10     80      20     90      15     95     150      +   3.4e-10   40.2   0.0  second model same read
      |16S_rRNA             RF00177    read_002             -                1    115       8    122       2    128     140      -   5.0e-25   80.0   0.2  reverse strand hit
      |16S_rRNA             RF00177    read_003             -                1     50      10     60       5     65     120      +   2.0e-03    9.5   0.0  below score threshold
      |16S_rRNA             RF00177    read_004             -                1    100       1    100       1    100     100      +   1.0e-20   70.0   0.0  tied top score a
      |18S_rRNA             RF01960    read_004             -                1    100       1    100       1    100     100      +   1.0e-20   70.0   0.0  tied top score b
      |ssu_18S_euk          RF01960    read_005             -                3     90      12     99      10    105     160      +   2.2e-15   55.0   0.0  eukaryotic hit
      |ssu_18S_euk          RF01960    read_006             -                4     88      15    101      12    107     155      -   7.7e-12   55.5   0.1  second euk hit
      |""".stripMargin

  /** F12: runinfo JSON (reference `Snakefile:166-183`,
    * `raw_reads.py:101-133`) — one JSON object per line, PAIRED and
    * SINGLE layouts plus a row with a missing optional field. */
  val runinfoJson: Seq[String] = Seq(
    """{"run": "SRR000001", "library_layout": "PAIRED", "spots": 1500, "bases": 450000}""",
    """{"run": "SRR000002", "library_layout": "SINGLE", "spots": 800, "bases": 120000}""",
    """{"run": "SRR000003", "library_layout": "PAIRED", "spots": 2000}""")

  /** F2: blast-m8 13-col — tied e-values, margin-straddling scores,
    * single- vs multi-lineage genes. */
  val m8: String = Seq(
    "gene_1\t300\tUniRef100_A1\t350\t1\t300\t10\t310\t1.0e-50\t98.5\t2\t99.0\t85.0",
    "gene_1\t300\tUniRef100_A2\t340\t1\t295\t12\t305\t1.0e-45\t95.0\t5\t97.0\t84.0",
    "gene_1\t300\tUniRef100_A3\t330\t5\t290\t15\t300\t1.0e-20\t80.0\t20\t90.0\t80.0",
    "gene_2\t210\tUniRef100_B1\t220\t1\t210\t1\t210\t2.0e-30\t91.0\t8\t95.0\t92.0",
    "gene_2\t210\tUniRef100_B2\t225\t1\t208\t3\t211\t2.0e-30\t91.0\t8\t94.0\t91.0",
    "gene_3\t150\tUniRef100_C1\t160\t1\t150\t1\t150\t3.0e-10\t75.0\t30\t88.0\t85.0"
  ).mkString("\n")

  /** S7: `seqkit stats -a -T` output (reference `pypelib/utils.py:52-95`
    * load_stats): header row, TEXT_COLS file/format/type, everything
    * else numeric with the int-or-float mix. */
  val seqkitStats: String = Seq(
    "file\tformat\ttype\tnum_seqs\tsum_len\tmin_len\tavg_len\tmax_len\t" +
      "Q1\tQ2\tQ3\tsum_gap\tN50\tQ20(%)\tQ30(%)\tAvgQual\tGC(%)",
    "samp_1_fwd.fastq\tFASTQ\tDNA\t1000\t150000\t140\t150.0\t160\t" +
      "145\t150\t155\t0\t150\t98.52\t95.21\t35.8\t51.25",
    "samp_1_rev.fastq\tFASTQ\tDNA\t1000\t149000\t138\t149.0\t160\t" +
      "144\t149\t154\t0\t149\t97.93\t94.12\t35.1\t50.87",
    "samp_2.fastq\tFASTQ\tDNA\t500\t60000\t100\t120.0\t150\t" +
      "110\t121\t130\t0\t122\t99.01\t96.44\t36.2\t48.6"
  ).mkString("\n")

  /** S13: samtools/Rsamtools idxstats shape (reference
    * `summarize_marker_gene_read_mapping.R:43-52`): per-sequence
    * (seqnames, seqlength, mapped, unmapped), '*' = unmapped bucket,
    * names carrying the `;`-suffix and `-` the reference strips. */
  val idxstats: String = Seq(
    "marker-A;extra_info\t1500\t120\t3",
    "marker-B\t900\t80\t1",
    "marker-C\t2000\t0\t0",
    "*\t0\t0\t55"
  ).mkString("\n")

  /** S4: BBMap `.rpkm` file (reference `postgres.Rmd:1189-1203`
    * read_gene_abundance): 4 metadata lines to skip, then a
    * '#Name'-headed TSV whose Name column is a prodigal gene header
    * (` # `-separated fields, `;`-separated key=value tail). */
  val rpkm: String = Seq(
    "#File\tsamp_9.fq",
    "#Reads\t1000",
    "#Mapped\t900",
    "#RefSequences\t4",
    "#Name\tLength\tBases\tCoverage\tReads\tRPKM\tFrags\tFPKM",
    "gene_one # 1 # 500 # 1 # ID=1_1;partial=00;start_type=ATG;" +
      "rbs_motif=None;rbs_spacer=5-10bp;gc_cont=0.550\t500\t4000\t" +
      "8.00\t40\t80.5\t20\t40.25",
    "gene_two # 501 # 1200 # -1 # ID=1_2;partial=01;start_type=GTG;" +
      "rbs_motif=AGGAG;rbs_spacer=3bp;gc_cont=0.612\t700\t2100\t" +
      "3.00\t21\t30.0\t10\t15.00",
    "gene_three # 10 # 400 # 1 # ID=2_1;partial=00;start_type=ATG;" +
      "rbs_motif=None;rbs_spacer=None;gc_cont=0.480\t390\t780\t" +
      "2.00\t8\t20.5\t4\t10.25",
    "gene_four # 450 # 900 # 1 # ID=2_2;partial=10;start_type=TTG;" +
      "rbs_motif=GGA/GAG/AGG;rbs_spacer=5-10bp;gc_cont=0.525\t450\t" +
      "900\t2.00\t9\t22.0\t5\t11.00"
  ).mkString("\n")

  /** WARC/WET member (ISO 28500 framing): warcinfo preamble, three
    * conversion records (WET text extracts — the Common Crawl corpus
    * shape), one of them an exact duplicate payload of another (the
    * curate gate's dedup case), one response record (non-WET type the
    * curate stage must skip), and two malformed probes: a record with
    * no Content-Length and a record whose body is SHORTER than its
    * declared length (truncated transfer). CRLF line endings per spec;
    * payloads ASCII so the DuckDB oracle's char-based substring agrees
    * with the parser's octet-based cut (the multi-byte octet case is
    * pinned in WarcSpec instead, where no SQL replay is needed).
    * Trailing text after Content-Length octets (the two-blank-line
    * record separator) must be cut by the parser. */
  val warc: String = Seq(
    "WARC/1.0",
    "WARC-Type: warcinfo",
    "WARC-Record-ID: <urn:uuid:wi-0001>",
    "WARC-Date: 2026-08-01T00:00:00Z",
    "Content-Type: application/warc-fields",
    "Content-Length: 20",
    "",
    "software: graft-test",
    "",
    "WARC/1.0",
    "WARC-Type: conversion",
    "WARC-Record-ID: <urn:uuid:wet-0001>",
    "WARC-Target-URI: http://example.com/a",
    "WARC-Date: 2026-08-01T01:02:03Z",
    "Content-Type: text/plain",
    "Content-Length: 43",
    "",
    "The quick brown fox jumps over the lazy dog",
    "",
    "WARC/1.0",
    "WARC-Type: conversion",
    "WARC-Record-ID: <urn:uuid:wet-0002>",
    "WARC-Target-URI: http://example.com/b",
    "WARC-Date: 2026-08-01T01:05:00Z",
    "Content-Type: text/plain",
    "Content-Length: 43",
    "",
    "The quick brown fox jumps over the lazy dog",
    "",
    "WARC/1.0",
    "WARC-Type: conversion",
    "WARC-Record-ID: <urn:uuid:wet-0003>",
    "WARC-Target-URI: http://other.example.org/page",
    "WARC-Date: 2026-08-01T02:00:00Z",
    "Content-Type: text/plain",
    "Content-Length: 26",
    "",
    "short and distinct extract",
    "",
    "WARC/1.0",
    "WARC-Type: response",
    "WARC-Record-ID: <urn:uuid:resp-0001>",
    "WARC-Target-URI: http://example.com/a",
    "WARC-Date: 2026-08-01T01:02:03Z",
    "Content-Type: application/http;msgtype=response",
    "Content-Length: 37",
    "",
    "HTTP/1.1 200 OK\r\n\r\nraw http body here",
    "",
    "WARC/1.0",
    "WARC-Type: conversion",
    "WARC-Record-ID: <urn:uuid:bad-nolen>",
    "WARC-Target-URI: http://example.com/nolen",
    "WARC-Date: 2026-08-01T03:00:00Z",
    "Content-Type: text/plain",
    "",
    "payload with no declared length",
    "",
    "WARC/1.0",
    "WARC-Type: conversion",
    "WARC-Record-ID: <urn:uuid:bad-trunc>",
    "WARC-Target-URI: http://example.com/trunc",
    "WARC-Date: 2026-08-01T03:30:00Z",
    "Content-Type: text/plain",
    "Content-Length: 999",
    "",
    "cut off mid-",
    ""
  ).mkString("\r\n")

  /** One WARC record as CRLF lines with a COMPUTED Content-Length
    * (hand-counted lengths rot; HTML payloads are too long to count). */
  private def warcRecLines(typ: String, id: String, uri: String,
      date: String, ctype: String, payload: String): Seq[String] =
    Seq("WARC/1.0", s"WARC-Type: $typ", s"WARC-Record-ID: <$id>") ++
      (if (uri.isEmpty) Seq.empty[String]
       else Seq(s"WARC-Target-URI: $uri")) ++
      Seq(s"WARC-Date: $date", s"Content-Type: $ctype",
        s"Content-Length: ${payload.getBytes("UTF-8").length}",
        "", payload, "")

  private def httpHtml(html: String): String =
    "HTTP/1.1 200 OK\r\nServer: graft-test\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n\r\n" + html

  /** Content page: title/h1/prose blocks to KEEP; nav + footer chrome
    * to PRUNE by link density; script/style/comment to DROP wholesale;
    * entities (`&amp; &lt; &quot; &#39; &nbsp;`) to decode; an inline
    * anchor inside real prose that must SURVIVE the prune. ASCII-only
    * and no line starts with `WARC/1.` (keeps the regex-twin oracle
    * replay exact). */
  private val htmlPage1: String = Seq(
    "<!DOCTYPE html>",
    "<html><head><title>Widgets &amp; Gears</title>",
    "<style>p { margin: 0; } .x > a { color: red; }</style>",
    "<script type=\"text/javascript\">var t = \"<p>fake</p>\";" +
      "</script>",
    "</head><body>",
    "<nav><a href=\"/\">Home</a> <a href=\"/shop\">Shop</a> " +
      "<a href=\"/blog\">Blog</a></nav>",
    "<h1>Widgets &amp; Gears Catalog</h1>",
    "<p>Our catalog lists forty distinct widget models with full " +
      "specifications.</p>",
    "<p>Each widget ships with a <a href=\"/warranty\">warranty " +
      "card</a> and a printed manual covering 3 &lt; 5 safety " +
      "checks and &quot;quoted&quot; advice.</p>",
    "<!-- editorial note: must vanish entirely -->",
    "<div>It&#39;s the gear section&nbsp;next, with plain text.</div>",
    "<footer><a href=\"/terms\">Terms</a> " +
      "<a href=\"/privacy\">Privacy</a></footer>",
    "</body></html>").mkString("\n")

  /** Link-farm page: list items are pure anchors (pruned); one prose
    * sentence with an inline link sits right at the density boundary. */
  private val htmlPage2: String = Seq(
    "<html><head><title>Partner directory</title></head><body>",
    "<ul><li><a href=\"/a1\">First partner site</a></li>",
    "<li><a href=\"/a2\">Second partner site</a></li>",
    "<li><a href=\"/a3\">Third partner site</a></li></ul>",
    "<p>See also our <a href=\"/more\">many more links</a> page.</p>",
    "</body></html>").mkString("\n")

  /** Re-serve of page 1 with DIFFERENT chrome (other nav/footer
    * links, other styling) around the SAME content blocks: raw bytes
    * differ, extracted text is identical — the mirror-site case only
    * the engine's own extraction can collapse to an exact dup. */
  private val htmlPage1Mirror: String = Seq(
    "<html><head><title>Widgets &amp; Gears</title>",
    "<style>body { font: serif; }</style>",
    "</head><body>",
    "<nav><a href=\"/start\">Start</a> <a href=\"/cat\">Catalog</a>" +
      "</nav>",
    "<h1>Widgets &amp; Gears Catalog</h1>",
    "<p>Our catalog lists forty distinct widget models with full " +
      "specifications.</p>",
    "<p>Each widget ships with a <a href=\"/w2\">warranty " +
      "card</a> and a printed manual covering 3 &lt; 5 safety " +
      "checks and &quot;quoted&quot; advice.</p>",
    "<div>It&#39;s the gear section&nbsp;next, with plain text.</div>",
    "<footer><a href=\"/imprint\">Imprint</a></footer>",
    "</body></html>").mkString("\n")

  /** Fourth serve of page 1's content with NUMERIC character
    * references (`&#38;` decimal, `&#x22;` hex, `&#160;` for nbsp)
    * where the original uses named entities, around yet another set
    * of chrome: decoded text is identical, so the curate gate can
    * only collapse it into page 1's fingerprint through the numeric
    * reference decode path. */
  private val htmlPage1NumEnt: String = Seq(
    "<html><head><title>Widgets &#38; Gears</title>",
    "</head><body>",
    "<nav><a href=\"/n1\">Index</a></nav>",
    "<h1>Widgets &#38; Gears Catalog</h1>",
    "<p>Our catalog lists forty distinct widget models with full " +
      "specifications.</p>",
    "<p>Each widget ships with a <a href=\"/w3\">warranty " +
      "card</a> and a printed manual covering 3 &#60; 5 safety " +
      "checks and &#x22;quoted&#x22; advice.</p>",
    "<div>It&#x27;s the gear section&#160;next, with plain text.</div>",
    "<footer><a href=\"/colophon\">Colophon</a></footer>",
    "</body></html>").mkString("\n")

  /** Page behind an interim response + folded header (below). */
  private val htmlPageFold: String = Seq(
    "<html><head><title>Folded dispatch check</title></head><body>",
    "<p>Interim responses and folded headers must not hide this " +
      "prose from the extraction dispatch.</p>",
    "</body></html>").mkString("\n")

  /** HTTP payload with a leading `100 Continue` INTERIM block and an
    * RFC 7230 obs-FOLDED Content-Type header — the two dispatch
    * evasions the r16 review flagged; extraction must still find
    * text/html. */
  private val httpFolded: String =
    "HTTP/1.1 100 Continue\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nServer: graft-test\r\n" +
      "Content-Type: text/html;\r\n charset=UTF-8\r\n\r\n" +
      htmlPageFold

  /** WARC member for the HTML-extraction gates: warcinfo, five
    * `response` records carrying HTTP+HTML (the raw Common Crawl
    * shape; the third a mirror of the first — same content,
    * different chrome; the fourth the numeric-entity serve of the
    * same content; the fifth behind an interim+folded header), one
    * non-HTML response (dispatch must skip), one WET conversion
    * record (wrong type — skip). */
  val warcHtml: String = (
    warcRecLines("warcinfo", "urn:uuid:hwi-0001", "",
      "2026-08-10T00:00:00Z", "application/warc-fields",
      "software: graft-test") ++
    warcRecLines("response", "urn:uuid:html-0001",
      "http://example.com/article", "2026-08-10T01:00:00Z",
      "application/http;msgtype=response", httpHtml(htmlPage1)) ++
    warcRecLines("response", "urn:uuid:html-0003",
      "http://mirror.example.net/article-copy",
      "2026-08-10T04:00:00Z",
      "application/http;msgtype=response",
      httpHtml(htmlPage1Mirror)) ++
    warcRecLines("response", "urn:uuid:html-0004",
      "http://numents.example.org/article-ent",
      "2026-08-10T05:00:00Z",
      "application/http;msgtype=response",
      httpHtml(htmlPage1NumEnt)) ++
    warcRecLines("response", "urn:uuid:html-0005",
      "http://folded.example.com/interim", "2026-08-10T06:00:00Z",
      "application/http;msgtype=response", httpFolded) ++
    warcRecLines("response", "urn:uuid:html-0002",
      "http://partners.example.org/dir", "2026-08-10T02:00:00Z",
      "application/http;msgtype=response", httpHtml(htmlPage2)) ++
    warcRecLines("response", "urn:uuid:json-0001",
      "http://api.example.com/v1", "2026-08-10T03:00:00Z",
      "application/http;msgtype=response",
      "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" +
        "{\"not\": \"html\"}") ++
    warcRecLines("conversion", "urn:uuid:hwet-0001",
      "http://example.com/article", "2026-08-10T01:00:00Z",
      "text/plain", "already extracted text, not this gate's input")
  ).mkString("\r\n")

  // ---- byte-faithful (mixed-charset) BINARY member ----

  /** One record of the binary member fixture: payload as raw octets,
    * optional extra WARC headers (revisit's Refers-To/Digest). */
  final case class WarcBinRec(typ: String, id: String, uri: String,
      date: String, ctype: String, extraHeaders: Seq[String],
      payload: Array[Byte])

  /** Shared page content (DECODED form) — served UTF-8 by one record
    * and ISO-8859-1 by another, so the charset decode (not the raw
    * bytes) is what makes them an exact pair. Chars ≤ U+00FF only so
    * Latin-1 can carry it. */
  val pageAccents: String = Seq(
    "<html><head><title>Café guide</title></head><body>",
    "<h1>Café à Montréal</h1>",
    "<p>The café serves crêpes, pâtisserie and " +
      "citron pressé every day of the week.</p>",
    "<p>Entry is free and the saison runs long.</p>",
    "</body></html>").mkString("\n")

  /** Windows-1252 page: curly quotes / en-dash / € / ™ — the C1
    * octet range a plain Latin-1 decode would leave as control
    * codepoints. */
  val pageCurly: String = Seq(
    "<html><head><title>Quote digest</title></head><body>",
    "<h1>What they said</h1>",
    "<p>“Budgets aren’t the issue – throughput " +
      "is,” the engineer said.</p>",
    "<p>The Widget™ kit costs €49 and ships tomorrow.</p>",
    "</body></html>").mkString("\n")

  private def httpBytes(ctype: String,
      body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nServer: graft-test\r\n" +
      s"Content-Type: $ctype\r\n\r\n").getBytes("US-ASCII") ++ body

  /** BMP response payload (image bytes inside a `response` record —
    * the case a UTF-8 String round-trip silently corrupts). */
  def bmpPayload: Array[Byte] =
    graft.multimodal.Multimodal.bmpBytes(7L, 5, 4)

  /** Records of the mixed member: warcinfo; the SAME page served
    * UTF-8 and Latin-1; a Windows-1252 page; a binary BMP response;
    * a `revisit` record (Common Crawl's unchanged-re-crawl marker,
    * empty payload, digest pointing at the UTF-8 record). */
  val warcMixedRecs: Seq[WarcBinRec] = Seq(
    WarcBinRec("warcinfo", "urn:uuid:bwi-0001", "",
      "2026-08-12T00:00:00Z", "application/warc-fields", Nil,
      "software: graft-test".getBytes("US-ASCII")),
    WarcBinRec("response", "urn:uuid:bin-utf8",
      "http://utf8.example.com/cafe", "2026-08-12T01:00:00Z",
      "application/http;msgtype=response", Nil,
      httpBytes("text/html; charset=UTF-8",
        pageAccents.getBytes("UTF-8"))),
    WarcBinRec("response", "urn:uuid:bin-latin1",
      "http://latin1.example.net/cafe-mirror", "2026-08-12T02:00:00Z",
      "application/http;msgtype=response", Nil,
      httpBytes("text/html; charset=ISO-8859-1",
        pageAccents.getBytes("ISO-8859-1"))),
    WarcBinRec("response", "urn:uuid:bin-win1252",
      "http://quotes.example.org/digest", "2026-08-12T03:00:00Z",
      "application/http;msgtype=response", Nil,
      httpBytes("text/html; charset=windows-1252",
        pageCurly.getBytes("windows-1252"))),
    WarcBinRec("response", "urn:uuid:bin-bmp",
      "http://img.example.com/logo.bmp", "2026-08-12T04:00:00Z",
      "application/http;msgtype=response", Nil,
      httpBytes("image/bmp", bmpPayload)),
    WarcBinRec("revisit", "urn:uuid:bin-revisit",
      "http://utf8.example.com/cafe", "2026-08-12T05:00:00Z",
      "application/http;msgtype=revisit",
      Seq("WARC-Refers-To: <urn:uuid:bin-utf8>",
        "WARC-Payload-Digest: sha1:GRAFTFIXTUREDIGEST0001"),
      Array.emptyByteArray))

  /** The framed member OCTETS (CRLF framing, computed
    * Content-Length, two-CRLF separators — same shape as `warc`,
    * binary payloads). The Latin-1/Win-1252/BMP payloads make the
    * member non-UTF-8: the byte-faithful parser must frame it
    * octet-exactly where the String form mis-counts (WarcSpec pins
    * both). */
  def warcMixed: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    warcMixedRecs.foreach { r =>
      val head = (Seq("WARC/1.0", s"WARC-Type: ${r.typ}",
        s"WARC-Record-ID: <${r.id}>") ++
        (if (r.uri.isEmpty) Seq.empty[String]
         else Seq(s"WARC-Target-URI: ${r.uri}")) ++
        Seq(s"WARC-Date: ${r.date}") ++ r.extraHeaders ++
        Seq(s"Content-Type: ${r.ctype}",
          s"Content-Length: ${r.payload.length}", "", ""))
        .mkString("\r\n")
      out.write(head.getBytes("US-ASCII"))
      out.write(r.payload)
      out.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    out.toByteArray
  }
}
