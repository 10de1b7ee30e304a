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
    val hPath = new org.apache.hadoop.fs.Path(tablePath)
    val fs = hPath.getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(hPath)) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(key, StringType))))
    } else spark.read.parquet(tablePath).select(key).distinct()
  }

  /** Rows of `incoming` whose key is not yet loaded — the canonical
    * incremental filter. */
  def newRows(incoming: DataFrame, existingKeys: DataFrame,
      key: String): DataFrame =
    incoming.join(broadcast(existingKeys.select(key).distinct()),
      Seq(key), "left_anti")

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
    * only rows above the stored max. */
  def aboveWatermark(incoming: DataFrame, existing: DataFrame,
      tsCol: String): DataFrame = {
    val wm = existing.agg(max(col(tsCol)).as("wm"))
    incoming.crossJoin(broadcast(wm))
      .filter(col("wm").isNull || col(tsCol) > col("wm"))
      .drop("wm")
  }
}
