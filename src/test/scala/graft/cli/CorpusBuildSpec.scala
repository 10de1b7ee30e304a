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
}
