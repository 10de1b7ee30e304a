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
}
