package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.nio.file.Files

/** The anti-join incremental loader — the reference's backbone idiom
  * (`postgres.Rmd:240-248` + literal anti_join at 1972/2132/2213):
  * re-running a load with overlapping input appends only new keys. */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("appendIncremental loads only unseen keys across reruns") {
    val dir = Files.createTempDirectory("graft_inc").toFile
    val table = new java.io.File(dir, "warehouse").getAbsolutePath

    val batch1 = Seq(("samp_1", 10), ("samp_1", 11), ("samp_2", 20))
      .toDF("sample", "v")
    assert(Incremental.appendIncremental(spark, batch1, table,
      "sample") == 3)

    // rerun with overlap: samp_2 already loaded, samp_3 new
    val batch2 = Seq(("samp_2", 21), ("samp_3", 30)).toDF("sample", "v")
    assert(Incremental.appendIncremental(spark, batch2, table,
      "sample") == 1)

    val loaded = spark.read.parquet(table)
    assert(loaded.count() == 4)
    assert(loaded.select("sample").distinct().count() == 3)
    // partition layout: one dir per sample (partition pruning at scale)
    assert(new java.io.File(table).listFiles()
      .count(_.getName.startsWith("sample=")) == 3)

    // idempotence: a third identical run appends nothing
    assert(Incremental.appendIncremental(spark, batch2, table,
      "sample") == 0)
  }

  test("null keys are not re-ingested on rerun (null-safe anti-join)") {
    val dir = Files.createTempDirectory("graft_inc_null").toFile
    val table = new java.io.File(dir, "wh").getAbsolutePath
    val batch = Seq((Option("s1"), 1), (Option.empty[String], 2))
      .toDF("sample", "v")
    assert(Incremental.appendIncremental(spark, batch, table,
      "sample") == 2)
    // rerun with the same data: the null-keyed row must NOT re-append
    assert(Incremental.appendIncremental(spark, batch, table,
      "sample") == 0)
  }

  test("newRowsBloom == newRows, including null keys and fp recheck") {
    // keys dense enough that the sketch sees real collisions pressure
    val existing = spark.range(0, 500)
      .select(concat(lit("k"), col("id")).as("k"))
    val existingWithNull = existing
      .unionByName(Seq(Option.empty[String]).toDF("k"))
    val incoming = spark.range(300, 900)
      .select(concat(lit("k"), col("id")).as("k"),
        (col("id") * 2).as("v"))
      .unionByName(Seq((Option.empty[String], Option(-1L)))
        .toDF("k", "v"))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    // loaded set contains a null → incoming null row is NOT fresh
    val exact = Incremental.newRows(incoming,
      existingWithNull.distinct(), "k")
    val bloom = Incremental.newRowsBloom(incoming, existingWithNull,
      "k", expectedKeys = 500L)
    assert(canon(bloom) == canon(exact))
    assert(bloom.filter(col("k").isNull).count() == 0)

    // loaded set has NO null → incoming null row IS fresh
    val bloomNoNull =
      Incremental.newRowsBloom(incoming, existing, "k",
        expectedKeys = 500L)
    assert(canon(bloomNoNull) ==
      canon(Incremental.newRows(incoming, existing, "k")))
    assert(bloomNoNull.filter(col("k").isNull).count() == 1)
  }

  test("newRowsBloom first run: empty existing passes everything") {
    val existing = spark.range(0).select(col("id").cast("string").as("k"))
    val incoming = Seq((Option("a"), 1), (Option.empty[String], 2))
      .toDF("k", "v")
    val out = Incremental.newRowsBloom(incoming, existing, "k")
    assert(out.count() == 2)
  }

  test("high-watermark variant keeps only rows above max(ts)") {
    val existing = Seq(("a", 100L), ("b", 200L)).toDF("k", "ts")
    val incoming = Seq(("c", 150L), ("d", 200L), ("e", 250L))
      .toDF("k", "ts")
    val out = Incremental.aboveWatermark(incoming, existing, "ts")
      .select("k").as[String].collect().toSet
    assert(out == Set("e"))
    // empty existing table → everything passes
    val empty = existing.filter(lit(false))
    assert(Incremental.aboveWatermark(incoming, empty, "ts")
      .count() == 3)
  }
}
