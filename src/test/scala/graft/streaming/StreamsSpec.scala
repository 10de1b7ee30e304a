package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** The streaming hourly aggregation must equal its batch twin — they
  * share one implementation (`Streams.hourlyAgg`), driven here through
  * a real streaming query (file source → memory sink,
  * Trigger.AvailableNow ≈ the reference's process-everything-new rerun). */
class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Stage events.parquet into a temp dir — the file source watches a
    * directory, and this mirrors the reference's "files appear, next
    * run picks them up" arrival model. */
  private def stagedEventsDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("document curation stream == batch curation; a stream-side " +
    "fp-dedup collapses a re-delivered file") {
    val d = TestSpark.sf0001
    val batch = Streams.queries("st_curate_docs")(spark, d)
      .collect().map(_.toSeq).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_curate")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/documents.parquet"),
      dir.resolve("documents.parquet"))
    val q = Streams.curateDocs(Streams.docStream(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("st_curate_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("st_curate_out")
      .collect().map(_.toSeq).toSet == batch)

    // the same corpus file re-delivered under a new name: the
    // stream-side fingerprint dedup collapses every re-delivered doc
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/documents.parquet"),
      dir.resolve("documents_redelivered.parquet"))
    val q2 = Streams.curateDocs(Streams.docStream(spark, dir.toString))
      .dropDuplicates("fp")
      .writeStream.outputMode("append")
      .format("memory").queryName("st_curate_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val distinctFp = batch.map(_(1)).size // distinct fingerprints
    assert(spark.table("st_curate_dedup").count() == distinctFp)
  }

  test("streaming heavy hitters: one delivery == batch top-k exactly " +
    "(m exceeds the per-lang vocab → the sketch is exact); a second " +
    "delivery doubles every count via the kept state") {
    val d = TestSpark.sf0001
    val batch = graft.text.TextOps.heavyHitters(
      graft.Tables.t(spark, d, "documents"), "text", k = 15, m = 64)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3))).toSet

    // checkpointed parquet sink (the exactly-once-arrival pattern):
    // run 2 restores the run-1 state store and processes ONLY the
    // newly staged file — the doubling proves genuine state carry,
    // not reprocessing
    val dir = java.nio.file.Files.createTempDirectory("graft_hh")
    val outDir = java.nio.file.Files.createTempDirectory("graft_hh_out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hh_ck")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/documents.parquet"),
      dir.resolve("documents.parquet"))
    def run(): Unit = {
      val q = Streams.streamingHeavyHitters(
        Streams.docStream(spark, dir.toString))
        .writeStream.outputMode("append")
        .format("parquet").option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    import org.apache.spark.sql.functions._
    def latest() = {
      val t = spark.read.parquet(outDir.toString)
      val top = t.groupBy("lang").agg(max("gen").as("gen"))
      t.join(top, Seq("lang", "gen"))
        .select("lang", "rank", "token", "n_lb").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getLong(3))).toSet
    }
    run()
    assert(latest() == batch,
      "single-delivery streaming sketch must equal the exact batch top-k")

    // re-deliver the same corpus: state carries, every count doubles
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/documents.parquet"),
      dir.resolve("documents_again.parquet"))
    run()
    val doubled = batch.map { case (l, r, t2, n) => (l, r, t2, 2 * n) }
    assert(latest() == doubled,
      "second delivery must double every lower bound via kept state")
  }

  test("streaming AvailableNow result == batch result") {
    val d = TestSpark.sf0001
    val batch = Streams.queries("st_window_agg")(spark, d)
      .collect().map(_.toSeq).toSet

    val stream = Streams.hourlyAgg(
      Streams.eventStream(spark, stagedEventsDir()))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("st_test_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("st_test_out")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("stateful stream sessionization == batch lag/cumsum sessionization") {
    val d = TestSpark.sf0001
    val batchSessions = Streams.sessionizeBatch(
      graft.Tables.t(spark, d, "events"))
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_sessions"),
        org.apache.spark.sql.functions.sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    val q = Streams.sessionizeStream(
      Streams.eventStream(spark, stagedEventsDir()))
      .writeStream.outputMode("append")
      .format("memory").queryName("st_sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamSessions = spark.table("st_sess_out")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_sessions"),
        org.apache.spark.sql.functions.sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamSessions == batchSessions)
  }

  test("file-source checkpoint processes each arriving file exactly once") {
    // The reference's incremental model: files appear, the next run
    // picks up ONLY the new ones (glob + anti-join). Spark-native:
    // file-source + checkpoint. Two AvailableNow runs over a growing
    // directory must process each file once — no reprocessing, no loss.
    import java.nio.file.{Files, Paths}
    val inDir = Files.createTempDirectory("graft_inc_stream")
    val outDir = Files.createTempDirectory("graft_inc_out").toString
    val ckpt = Files.createTempDirectory("graft_inc_ckpt").toString
    val src = Paths.get(s"${TestSpark.sf0001}/events.parquet")
    val nPerFile = spark.read.parquet(src.toString).count()

    def runOnce(): Unit = {
      val q = Streams.eventStream(spark, inDir.toString)
        .select("event_id", "user_id", "value")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    Files.copy(src, inDir.resolve("e1.parquet"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == nPerFile)

    Files.copy(src, inDir.resolve("e2.parquet"))
    runOnce()
    // exactly 2× — the first file was NOT reprocessed
    assert(spark.read.parquet(outDir).count() == 2 * nPerFile)

    // a run with nothing new emits nothing new
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2 * nPerFile)
  }

  test("sessionization gap compares at microsecond precision") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // gaps of 1800.000001s (break) and 1799.999999s (no break):
    // second-truncated arithmetic would get both wrong ways
    val base = 1700000000000000L // µs
    val events = Seq(
      (1L, 1L, base),
      (2L, 1L, base + 1800000001L), // 1800.000001s later → new session
      (3L, 2L, base),
      (4L, 2L, base + 1799999999L) // 1799.999999s later → same session
    ).toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Streams.sessionizeBatch(events)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L) // two sessions
    assert(out(2L) == 1L) // one session
  }

  test("streaming dedup collapses a re-delivered file to unique events") {
    import java.nio.file.{Files, Paths}
    val inDir = Files.createTempDirectory("graft_dedup_stream")
    val src = Paths.get(s"${TestSpark.sf0001}/events.parquet")
    // same file delivered twice under different names
    Files.copy(src, inDir.resolve("a.parquet"))
    Files.copy(src, inDir.resolve("b.parquet"))
    val n = spark.read.parquet(src.toString).count()

    val q = Streams.dedupedStream(spark, inDir.toString)
      .select("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("st_dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("st_dedup_out")
    assert(out.count() == n) // not 2n: duplicates dropped
    assert(out.distinct().count() == n)
  }

  test("watermarked append-mode stream runs to completion") {
    val q = Streams.streamingHourlyAgg(spark, stagedEventsDir())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("st_test_wm")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode only emits windows closed by the watermark; with a
    // single batch most stay open — liveness, not counts, is the check.
    assert(spark.table("st_test_wm").columns.length == 4)
  }

  test("stream-stream interval join == batch join") {
    val d = TestSpark.sf0001
    val batch = Streams.queries("st_stream_join")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty) // fixture must actually exercise the join

    val q = Streams.clickPurchaseStream(spark, stagedEventsDir())
      .writeStream.outputMode("append")
      .format("memory").queryName("st_ssjoin_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("st_ssjoin_out")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("stream-static enrichment == batch enrichment") {
    val d = TestSpark.sf0001
    val customers = graft.Tables.t(spark, d, "customer")
    val batch = Streams.queries("st_enrich")(spark, d)
      .collect().map(_.toSeq).toSet

    val q = Streams.enrichedStream(spark, stagedEventsDir(), customers)
      .writeStream.outputMode("complete")
      .format("memory").queryName("st_enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("st_enrich_out")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming z-score: two-batch checkpointed replay carries the " +
    "per-user frame state and equals the batch w9 on the full feed") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = TestSpark.sf0001
    val full = graft.Tables.t(spark, d, "events")
    // global ts split keeps every user in-order across the two files
    val cut = full.select(expr("percentile(unix_micros(ts), 0.5)"))
      .as[Double].head().toLong
    val inDir = Files.createTempDirectory("graft_z_in")
    val ckpt = Files.createTempDirectory("graft_z_ckpt").toString
    val outDir = Files.createTempDirectory("graft_z_out").toString
    def runOnce(): Unit = {
      val q = Streams.streamingZscore(
          Streams.eventStream(spark, inDir.toString))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    full.filter(unix_micros(col("ts")) <= cut).coalesce(1)
      .write.parquet(inDir.resolve("part1").toString)
    Files.list(inDir.resolve("part1")).forEach { f =>
      if (f.toString.endsWith(".parquet"))
        Files.copy(f, inDir.resolve("e1.parquet"))
    }
    runOnce()
    full.filter(unix_micros(col("ts")) > cut).coalesce(1)
      .write.parquet(inDir.resolve("part2").toString)
    Files.list(inDir.resolve("part2")).forEach { f =>
      if (f.toString.endsWith(".parquet"))
        Files.copy(f, inDir.resolve("e2.parquet"))
    }
    runOnce()
    val streamed = spark.read.parquet(outDir)
      .select("user_id", "event_id", "n_win", "sx", "sx2", "zscore")
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Windows.queries("w9_rolling_zscore")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch) // state carry: frames straddle the cut
  }
}
