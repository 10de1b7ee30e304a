package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Multimodal plumbing: the batched (mapPartitions) decode path must
  * produce exactly what the declarative expression path produces, and
  * metadata-only plans must not read the payload column. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = graft.Tables.t(spark, TestSpark.sf0001, "documents")

  test("batched decode == declarative frame features") {
    val declarative =
      Multimodal.sampleFrames(Multimodal.withVideoColumn(docs), 10)
    // same frames, but features computed by the batch-shaped path
    val frames = Multimodal
      .withVideoColumn(docs)
      .select(col("doc_id"), col("text"),
        col("vmeta.n_frames").as("n_frames"),
        explode(sequence(lit(0L), col("vmeta.n_frames") - 1, lit(10L)))
          .as("frame_idx"))
    val batched = Multimodal.decodeFramesBatched(frames, "text",
        batchSize = 7) // deliberately small + non-divisor batch size
      .drop("text")
    assert(batched.collect().map(_.toSeq).toSet ==
      declarative.collect().map(_.toSeq).toSet)
    assert(declarative.count() > 0)
  }

  test("metadata-only projection prunes the payload column") {
    val metaOnly = Multimodal.withImageColumn(docs)
      .filter(col("meta.width") > 320)
      .select(col("doc_id"), col("meta.width"))
    val scan = metaOnly.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    // the parquet scan must not materialize `text` (the payload
    // source) beyond what the width derivation needs — and the binary
    // payload itself is derived, never scanned
    assert(!scan.contains("image"))
  }

  test("frame fan-out plan does not carry the video payload") {
    val feats =
      Multimodal.sampleFrames(Multimodal.withVideoColumn(docs), 10)
        .select("doc_id", "frame_idx", "frame_feat")
    val plan = feats.queryExecution.optimizedPlan.toString
    assert(!plan.contains("to_binary"),
      "payload column should be pruned from the frame-feature plan")
  }

  test("audio segmentation: overlapped windows tile each document") {
    import org.apache.spark.sql.functions._
    val segs = Multimodal.segmentAudio(Multimodal.withAudioColumn(docs))
    val perDoc = segs.groupBy("doc_id", "duration_ms")
      .agg(count(lit(1)).as("n_segs"),
        min("seg_start").as("first"), max("seg_start").as("last"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (dur, n) = (r.getLong(1), r.getLong(2))
      // hop 500, width 1000: floor((dur-1000)/500)+1 windows from 0,
      // last window ends exactly at dur (durations are 500-aligned)
      assert(n == (dur - 1000) / 500 + 1, s"doc ${r.getLong(0)}")
      assert(r.getLong(3) == 0L)
      assert(r.getLong(4) + 1000 == dur)
    }
  }
}
