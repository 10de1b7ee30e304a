package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from the SURVEY §2 inventory
  * (key prefix = the §2 id: a=aggregation, j=join, w=window, p=pivot,
  * t=taxonomy, f=scalar-function family, g=GLAMR pipeline, d=dedup,
  * x=similarity, tx=text-analysis, s=source reader, st=streaming).
  * `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible entry; the rest get the driver's rows-only check and
  * a golden ScalaTest spec instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The TPM pipeline (reference `code/postgres_scripts/tpm.R:18-35`) —
    * ingest, 2-hop broadcast join, per-sample window normalization. */
  def entry(spark: SparkSession): DataFrame =
    ops.Abundance.tpm(spark, "/root/testdata/sf0.001")

  /** The single source of truth for which modules contribute gates.
    * `queries` folds over THIS sequence, and SparkEntrySpec's
    * no-key-collision guard derives its declared sum from it too — a
    * new module added here is covered by the guard automatically; a
    * module added anywhere else cannot reach the driver at all. */
  val queryModules: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(
      ops.Relational.queries, ops.ScaleOps.queries,
      ops.TemporalJoins.queries, ops.Windows.queries,
      ops.Pivots.queries, ops.Abundance.queries,
      ops.Amplicon.queries, ops.Bins.queries,
      ops.Checks.queries, ops.Cdc.queries,
      ops.Expectations.queries, ops.WebGraph.queries,
      ops.Ecology.queries, ops.Skew.queries,
      ops.Glamr.queries, ops.Primers.queries,
      tax.Lineage.queries, tax.SetCover.queries,
      tax.TaxAbund.queries, text.TextOps.queries, text.Html.queries,
      dedup.Dedup.queries, sim.Similarity.queries,
      ingest.Overrides.queries, io.SourceQueries.queries,
      io.WarehouseIngest.queries, io.CatalogIngest.queries,
      streaming.Streams.queries, multimodal.Multimodal.queries)

  /** Same discipline for the oracles (paired with queryModules). */
  val oracleModules: Seq[Map[String, String]] =
    Seq(
      ops.Relational.oracle, ops.ScaleOps.oracle,
      ops.TemporalJoins.oracle, ops.Windows.oracle,
      ops.Pivots.oracle, ops.Abundance.oracle,
      ops.Amplicon.oracle, ops.Bins.oracle,
      ops.Checks.oracle, ops.Cdc.oracle,
      ops.Expectations.oracle, ops.WebGraph.oracle,
      ops.Ecology.oracle, ops.Skew.oracle,
      ops.Glamr.oracle, ops.Primers.oracle,
      tax.Lineage.oracle, tax.SetCover.oracle,
      tax.TaxAbund.oracle, text.TextOps.oracle, text.Html.oracle,
      dedup.Dedup.oracle, sim.Similarity.oracle,
      ingest.Overrides.oracle, io.SourceQueries.oracle,
      io.WarehouseIngest.oracle, io.CatalogIngest.oracle,
      streaming.Streams.oracle, multimodal.Multimodal.oracle)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryModules.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oracleModules.reduce(_ ++ _)
}
