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
}
