package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.nio.file.Files

/** End-to-end corpus-build driver: first build, rerun no-op, store
  * invariants. */
class CorpusBuildSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("corpus build runs end-to-end, reruns as a no-op, and the " +
    "store honors its invariants") {
    val wh = Files.createTempDirectory("graft_corpus").toString
    CorpusBuild.run(spark, TestSpark.sf0001, wh)

    val store = spark.read.parquet(s"$wh/corpus")
    val n1 = store.count()
    assert(n1 > 0)
    // every processed doc is marked seen — including curation drops,
    // so the seen table dominates the store
    val seen = spark.read.parquet(s"$wh/seen").count()
    assert(seen >= n1)
    // store-level invariants (the driver also asserts these; re-check
    // from a fresh read)
    assert(store.groupBy("fp").count().filter(col("count") > 1)
      .count() == 0)
    assert(store.filter(col("quality") < CorpusBuild.minQuality)
      .count() == 0)
    assert(store.select("shard").distinct().count() > 1)
    // scrub ran: stored text never contains a raw email
    assert(store.filter(col("text")
      .rlike(graft.text.TextOps.emailRe)).count() == 0)

    // rerun on the same input: nothing new, store byte-count stable
    CorpusBuild.run(spark, TestSpark.sf0001, wh)
    assert(spark.read.parquet(s"$wh/corpus").count() == n1)
    assert(spark.read.parquet(s"$wh/seen").count() == seen)
  }

  test("revisit + no-text records enter the seen ledger via " +
    "fromWarcFull, so a second nightly cycle is a full no-op") {
    val dir = Files.createTempDirectory("graft_cb_revisit")
    Files.write(dir.resolve("m0.warc"), graft.io.Fixtures.warcMixed)
    val wh = Files.createTempDirectory("graft_cb_revisit_wh").toString
    val (batch, processed) = CorpusBuild.fromWarcFull(spark,
      dir.toString)
    CorpusBuild.runBatch(spark, batch, wh, Some(processed))
    // ledger carries ALL 5 valid content records (3 html pages + the
    // BMP response + the revisit), not just the text batch
    val seen = spark.read.parquet(s"$wh/seen")
    assert(seen.columns.toSeq == Seq("doc_uid"))
    assert(seen.select("doc_uid").distinct().count() == 5)
    // second cycle: EVERYTHING is pre-seen — no fresh docs, no new
    // ledger rows (the no-content records do not re-append either)
    val (batch2, processed2) = CorpusBuild.fromWarcFull(spark,
      dir.toString)
    CorpusBuild.runBatch(spark, batch2, wh, Some(processed2))
    assert(spark.read.parquet(s"$wh/seen").count() == 5)
  }

  test("a pre-doc_uid seen ledger (doc_id column only) keeps doc_id " +
    "keying with a warning instead of throwing or mixing schemas") {
    val dir = Files.createTempDirectory("graft_cb_migr")
    Files.write(dir.resolve("m0.warc"), graft.io.Fixtures.warcMixed)
    val wh = Files.createTempDirectory("graft_cb_migr_wh").toString
    val (batch, processed) = CorpusBuild.fromWarcFull(spark,
      dir.toString)
    // fabricate an old-schema ledger holding one of the batch ids
    graft.io.Writers.appendTable(
      batch.select("doc_id").orderBy("doc_id").limit(1), s"$wh/seen")
    CorpusBuild.runBatch(spark, batch, wh, Some(processed)) // no throw
    val seen = spark.read.parquet(s"$wh/seen")
    // schema stayed doc_id-only — no mixed parquet dir
    assert(seen.columns.toSeq == Seq("doc_id"))
    // the pre-seen id was not re-marked; the other 4 records were
    assert(seen.count() == 5)
    assert(seen.distinct().count() == 5)
  }

  test("incremental second batch: only genuinely new docs enter, " +
    "cross-batch dedup holds, invariants survive the append") {
    val wh = Files.createTempDirectory("graft_corpus_incr").toString
    val docs = graft.Tables.t(spark, TestSpark.sf0001, "documents")
    val total = docs.count()

    // night 1: the first half of the corpus
    CorpusBuild.runBatch(spark, docs.filter(col("doc_id") < 250), wh)
    val store1 = spark.read.parquet(s"$wh/corpus")
    val n1 = store1.count()
    assert(n1 > 0)

    // night 2: the FULL table — the first half must be screened out by
    // the seen gate, the second half curated against the live store
    // (this is the path where counting after the append re-ran the DAG)
    CorpusBuild.runBatch(spark, docs, wh)
    val store2 = spark.read.parquet(s"$wh/corpus")
    val n2 = store2.count()
    assert(n2 > n1, s"second batch added nothing ($n1 -> $n2)")
    // every processed doc marked seen exactly once, across both nights
    assert(spark.read.parquet(s"$wh/seen").count() == total)
    // cross-batch dedup: no doc curated twice, no fingerprint stored
    // twice (batch-2 copies of batch-1 docs must not re-enter)
    assert(store2.groupBy("doc_id").count()
      .filter(col("count") > 1).count() == 0)
    assert(store2.groupBy("fp").count()
      .filter(col("count") > 1).count() == 0)
    // night-1 rows are append-stable: still present, same fingerprints
    val s1Ids = store1.select("doc_id", "fp")
    assert(s1Ids.exceptAll(store2.select("doc_id", "fp")).isEmpty)
  }

  test("a batch pays exactly one connected-components run, stages the " +
    "cluster table, and releases every cache it took") {
    val wh = Files.createTempDirectory("graft_corpus_cc").toString
    val ccBefore = graft.dedup.Dedup.ccRuns.get()
    val cachedBefore =
      spark.sparkContext.getPersistentRDDs.keySet
    CorpusBuild.run(spark, TestSpark.sf0001, wh)
    // one CC execution per batch: keep-best and all later consumers
    // read the staged table, never re-propagate
    assert(graft.dedup.Dedup.ccRuns.get() == ccBefore + 1)
    // the clustering is durably staged (crash-safe resume point) and
    // covers every doc that entered in-batch dedup
    val staged = spark.read.parquet(s"$wh/stage/clusters")
    assert(staged.columns.toSet ==
      Set("doc_id", "cluster_id", "is_canonical"))
    assert(staged.count() > 0)
    assert(staged.groupBy("doc_id").count()
      .filter(col("count") > 1).count() == 0)
    // no cache outlives the batch — the CC label state (the historical
    // leak), the batch/canon/scored/sharded persists, all released
    val leaked =
      spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"runBatch leaked cached RDDs: $leaked")
  }

  test("the staged mix manifest is a temperature admission over the " +
    "store: subset ids, budgets respected, every store language " +
    "represented") {
    val wh = Files.createTempDirectory("graft_corpus_mix").toString
    CorpusBuild.run(spark, TestSpark.sf0001, wh)
    val store = spark.read.parquet(s"$wh/corpus")
    val mix = spark.read.parquet(s"$wh/mix")
    assert(mix.count() > 0)
    // admitted ids ⊆ store ids
    assert(mix.join(store, Seq("doc_id"), "left_anti").count() == 0)
    // per-language: admission never starts past the budget, and every
    // stored language gets a manifest presence (√-temperature gives
    // every nonempty language a positive budget)
    assert(mix.filter(col("cum_before") >= col("budget")).count() == 0)
    val storeLangs = store.select(col("lang_pred")).distinct()
      .collect().map(_.getString(0)).toSet
    val mixLangs = mix.select(col("lang_pred")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(mixLangs == storeLangs,
      s"languages missing from the mix: ${storeLangs -- mixLangs}")
  }
}
