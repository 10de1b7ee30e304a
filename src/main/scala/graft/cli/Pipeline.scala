package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end ETL driver (SURVEY §7.1 `cli/Main`): the Snakemake-DAG
  * analog as plain Scala control flow calling engine stages.
  *
  * Stages mirror the reference's nightly cycle:
  *  1. incremental ingest (anti-join; only unseen samples land),
  *  2. warehouse build (bucketed facts, broadcast dims as views),
  *  3. derived tables (TPM via window normalization → partitioned
  *     parquet, the `compute("tpm2")` analog),
  *  4. views (the bin_summary-style star join),
  *  5. invariant assertions (the reference's embedded checks as a
  *     gate, not a comment).
  *
  * Usage: graft.Pipeline <sfDir> <warehouseDir>
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, whDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$whDir/catalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, whDir)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, whDir: String): Unit = {
    // 1. incremental ingest: lineitem keyed by l_suppkey ("sample")
    val facts = graft.Tables.t(spark, sfDir, "lineitem")
      .withColumn("sample", col("l_suppkey"))
    val appended = graft.ingest.Incremental.appendIncremental(
      spark, facts, s"$whDir/lineitem_inc", "sample")
    println(s"[pipeline] ingest: $appended new rows")

    // 1b. regenerate the dispatch-assignments table, preserving manual
    //     edits and SKIPs (Overrides semantics)
    val assignPath = s"$whDir/assignments"
    val proposed = facts.select(col("sample").cast("string").as("key"))
      .distinct().withColumn("assignment", lit("DEFAULT"))
    // Hadoop-FS existence check — a java.io.File check would treat any
    // non-local warehouse as absent and destroy manual edits on rerun
    val existing =
      if (graft.ingest.Incremental.pathExists(spark, assignPath))
        spark.read.parquet(assignPath)
      else proposed.limit(0)
    val merged = graft.ingest.Overrides.mergeAssignments(existing, proposed)
    // write via temp then swap is the production move; overwrite is
    // fine in the single-writer pipeline
    val mergedRows = merged.collect()
    import spark.implicits._
    mergedRows.map(r => (r.getString(0), r.getString(1)))
      .toSeq.toDF("key", "assignment")
      .write.mode("overwrite").parquet(assignPath)
    val nEff = graft.ingest.Overrides.effective(
      spark.read.parquet(assignPath)).count()
    println(s"[pipeline] assignments: ${mergedRows.length} total, " +
      s"$nEff effective")

    // 2. dims as views (broadcast-sized)
    Seq("part", "supplier", "customer", "nation", "region")
      .foreach { n =>
        graft.io.Writers.createView(
          graft.Tables.t(spark, sfDir, n), s"dim_$n")
      }

    // 3. derived table: TPM → partitioned parquet (the tpm2 analog)
    val tpm = graft.ops.Abundance.tpm(spark, sfDir)
    graft.io.Writers.writePartitioned(tpm, s"$whDir/tpm2", Seq("sample"))

    // 4. star view over the ingested facts
    val star = spark.read.parquet(s"$whDir/lineitem_inc")
      .join(broadcast(spark.table("dim_part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
    graft.io.Writers.createView(star, "brand_revenue")

    // 5. invariants (reference: abort on violation,
    //    tax_abund_from_contigs.R:90-92 style)
    val badTpm = spark.read.parquet(s"$whDir/tpm2")
      .groupBy("sample").agg(sum("tpm").as("s"))
      .filter(abs(col("s") - 1e6) > 1.0).count()
    require(badTpm == 0, s"TPM invariant violated for $badTpm samples")
    val rows = spark.table("brand_revenue").count()
    require(rows > 0, "star view is empty")
    println(s"[pipeline] ok: tpm2 + brand_revenue ($rows brands)")
  }
}
