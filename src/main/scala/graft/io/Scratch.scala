package graft.io

import org.apache.spark.sql.DataFrame

/** Per-process scratch staging for gate wrappers whose operator stages
  * an intermediate (persist / localCheckpoint): write the result to a
  * scratch parquet, RELEASE the operator's cache, and hand back the
  * read-back frame — so repeated gate invocations leave
  * `sparkContext.getPersistentRDDs` FLAT instead of accumulating
  * ContextCleaner-reclaimed-only residue (the r12 bench residue
  * signature: +2 persistent RDDs per full-suite pass). Same root
  * discipline as the streaming gates' scratch (one tempdir per
  * process, cheap mkdir per use) and the `dupClustersStaged`
  * staged-table shape. */
object Scratch {

  private lazy val root: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_stage_scratch")
  private val runs = new java.util.concurrent.atomic.AtomicLong(0)

  /** Write `df` to a fresh scratch parquet dir, run `release` (the
    * operator's cache-release handle), return the read-back frame. */
  def stageAndRelease(df: DataFrame, release: () => Unit,
      tag: String): DataFrame = {
    val p = root.resolve(tag + "_" + runs.incrementAndGet()).toString
    df.write.mode("overwrite").parquet(p)
    release()
    df.sparkSession.read.parquet(p)
  }
}
