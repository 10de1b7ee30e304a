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

  /** Bloom-prefiltered anti-join: the 100 TB form of `newRows`.
    *
    * `newRows` broadcasts the distinct loaded keys — right-sized while
    * keys are sample ids (thousands), wrong once the dedup key is
    * per-document/per-read (billions): the distinct set no longer
    * broadcasts and the anti-join shuffles BOTH sides. This variant
    * shuffles neither:
    *
    *  1. one distributed aggregation pass over `existing` builds a
    *     Bloom sketch of the loaded keys (bytes, not rows — ~1.2 GB
    *     for 1e9 keys at 1% fpp), broadcast to every executor;
    *  2. incoming rows whose key the sketch definitely hasn't seen
    *     (the overwhelming majority of a fresh delta) pass straight
    *     through with NO join at all;
    *  3. only sketch-positives — true re-deliveries plus the fpp
    *     sliver of false positives — reach the exact anti-join, so
    *     its input is a tiny fraction of the delta.
    *
    * Result is EXACTLY `newRows` (bloom negatives are guaranteed
    * absent; positives are re-checked), which is what the gate query
    * oracles. Null keys probe as positives so the null-safe exact join
    * decides them, preserving `newRows`' NULL semantics. The delta is
    * scanned twice (pass-through + candidates) — at scale the delta is
    * the small side and two delta scans beat one delta-wide shuffle. */
  def newRowsBloom(incoming: DataFrame, existing: DataFrame,
      key: String, expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    // sketch over the canonical string form: one code path for any
    // key type, and probe-side casts stay codegen-friendly
    val keyed = existing.select(col(key).cast("string").as(key))
      .na.drop(Seq(key))
    // zero loaded non-null keys (first run) → everything except
    // null-keyed rows is trivially fresh, and stat.bloomFilter would
    // NPE on its null aggregate; nulls still take the exact path so
    // null-vs-null dedup semantics survive the first run too
    if (keyed.isEmpty) {
      val keys = existing.select(col(key).as("__graft_key")).distinct()
      return incoming.filter(col(key).isNotNull).unionByName(
        incoming.filter(col(key).isNull).join(keys,
          incoming(key) <=> keys("__graft_key"), "left_anti"))
    }
    val bf = keyed.stat.bloomFilter(key, expectedKeys, fpp)
    // ship the sketch as its portable byte form — BloomFilterImpl's
    // Java serialization does not survive closure capture (null bit
    // buffer on the executor); readFrom happens once per task
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = new BloomProbe(bos.toByteArray)
    val mightContain = udf { (k: String) => probe.might(k) }
    val probed = col(key).cast("string")
    val fresh = incoming.filter(!mightContain(probed))
    val candidates = incoming.filter(mightContain(probed))
    // exact recheck WITHOUT newRows' broadcast hint: the loaded key
    // set is exactly what may not fit in one executor here. Keys-only
    // sort-merge with a tiny probe side; AQE still broadcasts when the
    // key set turns out small.
    val keys = existing.select(col(key).as("__graft_key")).distinct()
    fresh.unionByName(
      candidates.join(keys,
        candidates(key) <=> keys("__graft_key"), "left_anti"))
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

  /** Serializable Bloom-sketch probe: carries the portable byte form,
    * rebuilds the filter lazily on first use per task. Null keys probe
    * positive so the exact recheck decides them. */
  private[ingest] class BloomProbe(bytes: Array[Byte])
      extends Serializable {
    @transient private lazy val bf =
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
    def might(k: String): Boolean = k == null || bf.mightContainString(k)
  }

  /** Filesystem-agnostic path existence (Hadoop FS, not java.io). */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    hPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(hPath)
  }
}
