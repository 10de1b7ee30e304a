package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse layout (SURVEY §1.2, §7.4 risk 7 — the 100 TB posture).
  *
  * The reference's Postgres warehouse relies on secondary indexes and
  * drop-index/bulk-load tricks; the Spark-native equivalents are
  * layout decisions made once at write time:
  *
  *  - **Partition by the sample-like key** → per-key reads prune to
  *    single directories (replaces the manual glob narrowing).
  *  - **Bucket + sort by the join key** → fact-fact joins co-locate:
  *    both sides hash to the same bucket files and the sort-merge join
  *    runs with NO Exchange (asserted in WarehouseSpec). At 100 TB the
  *    lineitem⨝orders class of join is the dominant shuffle; bucketing
  *    amortizes it into the initial load.
  *
  * Bucketed tables require the session catalog (`saveAsTable`).
  */
object Warehouse {

  /** Register a parquet table bucketed+sorted by its join key. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Load the two big facts as co-bucketed tables. */
  def buildFactTables(spark: SparkSession, sfDir: String,
      numBuckets: Int = 8): Unit = {
    writeBucketed(graft.Tables.t(spark, sfDir, "lineitem"),
      "w_lineitem", "l_orderkey", numBuckets)
    writeBucketed(graft.Tables.t(spark, sfDir, "orders"),
      "w_orders", "o_orderkey", numBuckets)
  }

  /** The co-located fact join: with both sides bucketed on the key,
    * this plans as SortMergeJoin over FileScans with zero Exchange. */
  def bucketedFactJoin(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.table("w_lineitem")
      .join(spark.table("w_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
  }

  /** Small-file compaction for a parquet directory — the maintenance
    * op the reference's per-sample layout makes mandatory at scale:
    * incremental per-sample appends leave thousands of KB-sized files,
    * and at 100 TB the footer/open overhead of small files dominates
    * scan time long before data volume does. Rewrites the directory to
    * ⌈bytes / targetBytes⌉ files via the staged-overwrite path (the
    * output is derived from its own previous contents, so the
    * read-overwrite cycle must be broken the same way K3b does).
    * Returns the file count after compaction. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    graft.io.Writers.overwriteStaged(df.repartition(nFiles), path)
    fs.listStatus(hPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }
}
