package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's backbone ingest idiom (SURVEY §1.4, §2.4 J5):
  * batch discovery + anti-join against already-loaded keys + append.
  * Every warehouse table in `postgres.Rmd` is loaded this way
  * (`postgres.Rmd:240-248`, literal `anti_join` at `1972,2132,2213`).
  *
  * Scale design: the "existing keys" side is a distinct projection of
  * ONE dictionary-encoded column of the target table — a metadata-cheap
  * scan — and the anti-join broadcasts it when small (sample counts are
  * thousands, not billions). Appends land as parquet partitioned by the
  * sample-like key, so later per-key reads prune to single partitions.
  */
object Incremental {

  /** Keys already present in the warehouse table (empty if absent).
    * Existence goes through the Hadoop FileSystem API, not
    * java.io.File — a local-only check would silently treat every
    * hdfs://, s3a://, or defaultFS-relative table as absent and
    * re-ingest the full input on each run. */
  def loadedKeys(spark: SparkSession, tablePath: String,
      key: String): DataFrame = {
    if (!pathExists(spark, tablePath)) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(key, StringType))))
    } else spark.read.parquet(tablePath).select(key).distinct()
  }

  /** Rows of `incoming` whose key is not yet loaded — the canonical
    * incremental filter. NULL-SAFE on the key: a plain equi-anti-join
    * never matches null = null, so null-keyed rows would be
    * re-classified as fresh and re-appended on every run (dplyr's
    * anti_join matches NAs; `<=>` reproduces that). */
  def newRows(incoming: DataFrame, existingKeys: DataFrame,
      key: String): DataFrame = {
    val keys = broadcast(existingKeys.select(col(key).as("__graft_key"))
      .distinct())
    incoming.join(keys, incoming(key) <=> keys("__graft_key"),
      "left_anti")
  }

  /** Full cycle: discover → anti-join → append, partitioned by key.
    * Returns the number of rows appended. The fresh set is cached so
    * count + write execute the discovery/anti-join plan once (and see
    * one consistent snapshot). */
  def appendIncremental(spark: SparkSession, incoming: DataFrame,
      tablePath: String, key: String): Long = {
    val fresh = newRows(incoming, loadedKeys(spark, tablePath, key), key)
      .persist()
    try {
      val n = fresh.count()
      if (n > 0)
        fresh.write.mode(SaveMode.Append)
          .partitionBy(key).parquet(tablePath)
      n
    } finally fresh.unpersist()
  }

  /** High-watermark variant for monotonically keyed sources (file
    * mtimes / import timestamps, reference `check_import_status.R:30-33`):
    * only rows above the stored max. The working column is namespaced
    * and guarded against collision with user data. */
  def aboveWatermark(incoming: DataFrame, existing: DataFrame,
      tsCol: String): DataFrame = {
    require(!incoming.columns.contains("__graft_wm"),
      "incoming already has a __graft_wm column")
    val wm = existing.agg(max(col(tsCol)).as("__graft_wm"))
    incoming.crossJoin(broadcast(wm))
      .filter(col("__graft_wm").isNull || col(tsCol) > col("__graft_wm"))
      .drop("__graft_wm")
  }

  /** Filesystem-agnostic path existence (Hadoop FS, not java.io). */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    hPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(hPath)
  }
}
