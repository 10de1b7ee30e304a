package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gate queries for the source readers (SURVEY §2.1). The driver's
  * sfDir holds only parquet, so the text-format readers run over the
  * embedded fixtures — the parse logic is identical to reading
  * `spark.read.textFile(path)`. No SQL oracle (DuckDB has no
  * FASTA/tblout reader) → rows-only check + ScalaTest goldens. */
object SourceQueries {

  private def lines(s: SparkSession, text: String): Dataset[String] = {
    import s.implicits._
    s.createDataset(text.split("\n").toSeq)
  }

  private def whole(s: SparkSession, text: String): Dataset[String] = {
    import s.implicits._
    s.createDataset(Seq(text))
  }

  /** S6: HMMER tblout parse (comment skip + split-N + multiword
    * description). */
  private def s6Tblout(s: SparkSession, d: String): DataFrame =
    Readers.parseTblout(lines(s, Fixtures.tblout))

  /** S11: FASTA parse with length + GC%. */
  private def s11Fasta(s: SparkSession, d: String): DataFrame =
    Readers.parseFastaText(whole(s, Fixtures.fasta))

  /** S12: FASTQ 4-line record parse. */
  private def s12Fastq(s: SparkSession, d: String): DataFrame =
    Readers.parseFastq(lines(s, Fixtures.fastq))

  /** S1+W2 composed: blast-m8 ingest then diamond tophit selection
    * (reference `postgres.Rmd:297-354`: read m8, `slice_min(evalue)`
    * per gene with deterministic tie-break). */
  private def s1M8Tophit(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("qseqid")
      .orderBy(col("evalue").asc, col("sseqid").asc)
    Readers.parseM8(lines(s, Fixtures.m8))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("qseqid", "sseqid", "evalue", "pident")
  }

  /** S15: filesystem catalog of the sfDir as a table. */
  private def s15Catalog(s: SparkSession, d: String): DataFrame =
    Readers.fileCatalog(s, d).filter(col("is_parquet"))

  /** S8: JSON ingest (runinfo; layout PAIRED/SINGLE detection feeds the
    * reference's dynamic fan-out, `Snakefile:150-164`). */
  private def s8Json(s: SparkSession, d: String): DataFrame =
    s.read.json(lines(s, Fixtures.runinfoJson.mkString("\n")))
      .select(col("run"), col("library_layout"),
        col("spots").cast("long").as("spots"),
        col("bases").cast("long").as("bases"),
        (col("library_layout") === "PAIRED").as("is_paired"))

  /** J9: file-existence as a join (reference `is_cluster_rep =
    * fs::file_exists(...)` `postgres.Rmd:1027`): expected table list ⟕
    * the filesystem catalog → presence flag. */
  private def j9FileJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val expected = graft.Tables.names.toDF("table_name")
    expected.join(
        Readers.fileCatalog(s, d).filter(col("is_parquet")),
        Seq("table_name"), "left")
      .select(col("table_name"), col("file_name").isNotNull.as("present"))
  }

  /** S15b: path-template parse via input_file_name — the unglue analog
    * (reference `unglue_data("data/omics/{sample_type}/{sample}/…")`
    * `postgres.Rmd:242`): recover the table name from the file path of
    * each scanned row. */
  private def s15bInputFile(s: SparkSession, d: String): DataFrame =
    graft.Tables.t(s, d, "lineitem")
      .select(regexp_extract(input_file_name(), "([a-z]+)\\.parquet", 1)
        .as("table_from_path"))
      .groupBy("table_from_path")
      .agg(count(lit(1)).as("n_rows"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s15b_input_file_name" -> s15bInputFile _,
    "s6_tblout_parse" -> s6Tblout _,
    "s11_fasta_parse" -> s11Fasta _,
    "s12_fastq_parse" -> s12Fastq _,
    "s1_m8_tophit" -> s1M8Tophit _,
    "s15_file_catalog" -> s15Catalog _,
    "s8_json_parse" -> s8Json _,
    "j9_file_exists_join" -> j9FileJoin _)

  val oracle: Map[String, String] = Map.empty
}
