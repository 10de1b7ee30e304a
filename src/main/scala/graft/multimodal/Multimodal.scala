package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata structs, with decode/featurize stages.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but every Spark-side piece that
  * matters at 100 TB is real and tested: the binary column, the
  * metadata struct schema, per-row featurization as codegen'd
  * expressions, and batch-shaped partition processing. Swapping the
  * stub for a real JNI/codec call changes no plan shape.
  *
  * Scale note: binary payloads ride in the same parquet row group as
  * their metadata; filters on metadata (width/height/n_bytes) prune
  * row groups WITHOUT reading payload bytes (parquet column pruning) —
  * that is the load-bearing property this module preserves.
  */
object Multimodal {

  /** Attach a fake binary payload + metadata struct to documents
    * (stand-in for real image bytes; deterministic from text). */
  def withImageColumn(docs: DataFrame): DataFrame =
    docs
      .withColumn("image", to_binary(col("text"), lit("utf-8")))
      .withColumn("meta", struct(
        (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("n_chars"), lit(480)) + 1).cast("int").as("height"),
        lit("fake/raw").as("format")))

  /** STUB decode/featurize — a real pipeline would decode pixels here
    * (???-equivalent); the deterministic fake keeps the schema, batch
    * shape, and downstream plan identical. */
  def decodeStub(images: DataFrame): DataFrame =
    images
      .withColumn("n_bytes", octet_length(col("image")).cast("int"))
      .withColumn("checksum", md5(col("image")))
      // fake "brightness": first byte + length, mod 256
      .withColumn("brightness",
        pmod(ascii(substring(col("text"), 1, 1)) + col("n_chars"),
          lit(256)).cast("int"))

  /** Gate query: full plumbing — binary col, metadata struct,
    * stub-decode features, metadata-only projection. Oracle works on
    * the text the payload was derived from. */
  private def mStub(s: SparkSession, d: String): DataFrame =
    decodeStub(withImageColumn(t(s, d, "documents")))
      .select(
        col("doc_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("n_bytes"),
        col("checksum"), col("brightness"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_multimodal_stub" -> mStub _)

  val oracle: Map[String, String] = Map(
    "m_multimodal_stub" ->
      """SELECT doc_id,
         CAST(n_chars % 640 + 1 AS INT) AS width,
         CAST(n_chars % 480 + 1 AS INT) AS height,
         CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
         md5(text) AS checksum,
         CAST((ascii(substr(text,1,1)) + n_chars) % 256 AS INT)
           AS brightness
         FROM documents""")
}
