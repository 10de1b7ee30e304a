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

  /** Attach a fake "video" payload: binary column + typed metadata
    * (frame count / fps), deterministic from the text. */
  def withVideoColumn(docs: DataFrame): DataFrame =
    docs
      .withColumn("video", to_binary(col("text"), lit("utf-8")))
      .withColumn("vmeta", struct(
        (pmod(col("n_chars"), lit(120)) + 1).cast("bigint")
          .as("n_frames"),
        lit(30).as("fps"), lit("fake/frames").as("format")))

  /** Frame sampling: every `every`-th frame index, exploded to one row
    * per sampled frame with a per-frame stub feature. The explode is
    * declarative (`sequence` + `explode`), so Catalyst prunes the
    * payload column entirely when downstream only reads features —
    * at 100 TB the frame fan-out must never force payload reads. */
  def sampleFrames(videos: DataFrame, every: Int = 10): DataFrame =
    videos
      .select(col("doc_id"), col("text"),
        col("vmeta.n_frames").as("n_frames"),
        explode(sequence(lit(0L), col("vmeta.n_frames") - 1,
          lit(every.toLong))).as("frame_idx"))
      .withColumn("frame_feat",
        md5(concat(col("text"), lit(":"),
          col("frame_idx").cast("string"))))
      .drop("text")

  /** Batch-shaped decode path: the real-codec form of `sampleFrames`'
    * feature step. Rows are processed in fixed-size batches inside
    * each partition (`mapPartitions` + grouped iterator) — the shape a
    * JNI/GPU decoder needs (amortized setup per batch, bounded memory
    * per task). The stub computes the same md5 the declarative
    * expression computes, so parity is testable; swapping in a real
    * decoder changes only the per-batch function. */
  def decodeFramesBatched(frames: DataFrame, textCol: String = "text",
      batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(frames.schema.fields :+
      StructField("frame_feat", StringType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val tIdx = frames.schema.fieldIndex(textCol)
    val fIdx = frames.schema.fieldIndex("frame_idx")
    frames.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup (a codec would init/bind here, once)
        val digest = java.security.MessageDigest.getInstance("MD5")
        batch.iterator.map { r =>
          digest.reset()
          val bytes = digest.digest(
            s"${r.getString(tIdx)}:${r.getLong(fIdx)}"
              .getBytes("UTF-8"))
          Row.fromSeq(r.toSeq :+
            bytes.map("%02x".format(_)).mkString)
        }
      }
    }(enc)
  }

  /** Attach a fake "audio" payload: binary column + typed metadata
    * (sample rate / duration), deterministic from the text. */
  def withAudioColumn(docs: DataFrame): DataFrame =
    docs
      .withColumn("audio", to_binary(col("text"), lit("utf-8")))
      .withColumn("ameta", struct(
        lit(16000).as("sample_rate"),
        ((pmod(col("n_chars"), lit(30)) + 1) * 1000).cast("bigint")
          .as("duration_ms"),
        lit("fake/pcm").as("format")))

  /** OVERLAPPED segmentation — the audio-feature windowing pattern
    * (`hop < width`, unlike `sampleFrames`' stride sampling): one row
    * per [start, start+width) window with a per-segment stub feature.
    * Same scale property: declarative sequence+explode, payload column
    * pruned unless a consumer asks for it; a real STFT/fbank kernel
    * replaces only the feature expression (or runs through
    * `decodeFramesBatched`'s batch shape). */
  def segmentAudio(audio: DataFrame, widthMs: Long = 1000L,
      hopMs: Long = 500L): DataFrame = {
    require(hopMs > 0 && widthMs >= hopMs,
      "segments must advance and overlap (hop ≤ width)")
    audio
      // clips shorter than one window yield no segments (a negative
      // sequence stop would otherwise fail the whole query)
      .filter(col("ameta.duration_ms") >= widthMs)
      .select(col("doc_id"), col("text"),
        col("ameta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0L), col("ameta.duration_ms") - widthMs,
          lit(hopMs))).as("seg_start"))
      .withColumn("seg_feat",
        md5(concat(col("text"), lit(":"),
          col("seg_start").cast("string"))))
      .drop("text")
  }

  // ---- real WAV/PCM codec (pure-JVM — the one genuinely decodable
  // media format in this container; image/video codecs remain the
  // declared stub boundary) ----

  /** Deterministic synthetic sample i of doc d — shared by the WAV
    * synthesizer and the DuckDB oracle (which recomputes it in SQL):
    * ((d·31 + i·7919) mod 20001) − 10000, always within 16-bit range. */
  private def synthSample(d: Long, i: Long): Int =
    (((d * 31L + i * 7919L) % 20001L) - 10000L).toInt

  /** Serialize a canonical 44-byte-header RIFF/WAVE file (PCM, 16-bit
    * LE, mono) around the synthetic samples — the fixture builder for
    * the REAL decode path below. */
  private[multimodal] def wavBytes(docId: Long, nSamples: Int,
      sampleRate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2)            // block align
    bb.putShort(16)           // bits
    bb.put("data".getBytes("US-ASCII"))
    bb.putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort(synthSample(docId, i.toLong).toShort); i += 1
    }
    bb.array()
  }

  /** Attach a REAL (byte-valid, decoder-parseable) WAV payload to
    * documents: n_samples = (n_chars mod 30 + 1)·80 at 8 kHz →
    * 10–300 ms clips, samples from `synthSample`. Runs through the
    * batched mapPartitions shape (the codec-boundary convention —
    * serialization is imperative byte work, not relational). */
  def withWavColumn(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(docs.schema.fields :+
      StructField("wav", BinaryType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val dIdx = docs.schema.fieldIndex("doc_id")
    val nIdx = docs.schema.fieldIndex("n_chars")
    docs.mapPartitions { it =>
      it.map { r =>
        val d = r.get(dIdx).asInstanceOf[Number].longValue
        val nChars = r.get(nIdx).asInstanceOf[Number].longValue
        val n = ((nChars % 30 + 1) * 80).toInt
        Row.fromSeq(r.toSeq :+ wavBytes(d, n, sampleRate))
      }
    }(enc)
  }

  /** REAL RIFF/WAVE parse: walks the chunk list byte-for-byte
    * (word-aligned skip of unknown chunks, fmt-before-data contract,
    * PCM/16-bit checks that RAISE on malformed input — no silent
    * fakes), returning format fields + content aggregates
    * (n_samples, duration, peak, Σ|sample|). */
  private[multimodal] def parseWav(bytes: Array[Byte])
      : (Int, Int, Int, Long, Long, Long, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(tag4() == "RIFF", "wav: missing RIFF magic")
    bb.getInt() // declared riff size; the chunk walk is authoritative
    require(tag4() == "WAVE", "wav: missing WAVE form type")
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var out: Option[(Int, Int, Int, Long, Long, Long, Long)] = None
    while (out.isEmpty && bb.remaining() >= 8) {
      val id = tag4()
      val len = bb.getInt()
      id match {
        case "fmt " =>
          val audioFormat = bb.getShort()
          require(audioFormat == 1, s"wav: not PCM (format=$audioFormat)")
          val ch = bb.getShort().toInt
          val rate = bb.getInt()
          bb.getInt(); bb.getShort() // byte rate, block align
          val bits = bb.getShort().toInt
          if (len > 16) bb.position(bb.position() + (len - 16))
          fmt = Some((ch, rate, bits))
        case "data" =>
          val (ch, rate, bits) = fmt.getOrElse(
            throw new IllegalArgumentException("wav: data before fmt"))
          require(bits == 16, s"wav: only 16-bit PCM supported ($bits)")
          require(ch >= 1, s"wav: bad channel count $ch")
          val nSamples = len.toLong / (2L * ch)
          var sum = 0L; var peak = 0L; var i = 0L
          while (i < nSamples * ch) {
            val a = math.abs(bb.getShort().toLong)
            sum += a; if (a > peak) peak = a
            i += 1
          }
          out = Some((ch, rate, bits, nSamples,
            nSamples * 1000L / rate, peak, sum))
        case _ =>
          bb.position(bb.position() + len + (len & 1)) // word-aligned
      }
    }
    out.getOrElse(throw new IllegalArgumentException("wav: no data chunk"))
  }

  /** Batched REAL decode of a WAV binary column — the
    * `decodeFramesBatched` grouped-iterator shape with an actual codec
    * behind it: rows decode in fixed-size batches per partition
    * (amortized setup, bounded memory), payload bytes parsed
    * chunk-by-chunk. Output is one row per clip with format fields +
    * content aggregates; the payload column is consumed here and NOT
    * carried forward, so downstream plans never reread bytes. */
  def decodeWav(audio: DataFrame, wavCol: String = "wav",
      batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val idField = audio.schema("doc_id")
    val outSchema = StructType(Seq(idField,
      StructField("sample_rate", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_ms", LongType),
      StructField("peak_abs", LongType),
      StructField("sum_abs", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val idIdx = audio.schema.fieldIndex("doc_id")
    val wIdx = audio.schema.fieldIndex(wavCol)
    audio.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup boundary (a native decoder would bind here)
        batch.iterator.map { r =>
          val (ch, rate, bits, n, dur, peak, sum) =
            parseWav(r.getAs[Array[Byte]](wIdx))
          Row(r.get(idIdx), rate, ch, bits, n, dur, peak, sum)
        }
      }
    }(enc)
  }

  /** Gate query: REAL codec end-to-end — synthesize byte-valid WAV
    * clips from documents, then decode them back through the batched
    * parser. The oracle recomputes every field from the synthesis
    * arithmetic (n_chars → n_samples, the synthSample recurrence →
    * peak/Σ|s|) — a header mis-write or parse drift on any doc
    * hash-mismatches. */
  private def mAudioDecode(s: SparkSession, d: String): DataFrame =
    decodeWav(withWavColumn(
      t(s, d, "documents").select("doc_id", "n_chars")))

  /** Gate query: frame sampling end-to-end (explode + per-frame
    * feature), oracled via generate_series on the same metadata. */
  private def mFrameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(withVideoColumn(t(s, d, "documents")), every = 10)

  /** Gate query: overlapped audio segmentation (1 s windows, 0.5 s
    * hop), oracled via generate_series on the same metadata. */
  private def mAudioSegments(s: SparkSession, d: String): DataFrame =
    segmentAudio(withAudioColumn(t(s, d, "documents")))

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
    "m_multimodal_stub" -> mStub _,
    "m_frame_sample" -> mFrameSample _,
    "m_audio_segments" -> mAudioSegments _,
    "m_audio_decode" -> mAudioDecode _)

  val oracle: Map[String, String] = Map(
    "m_audio_decode" ->
      """WITH p AS (
           SELECT doc_id, (n_chars % 30 + 1) * 80 AS n_samples
           FROM documents),
         v AS (
           SELECT doc_id, n_samples,
             abs((doc_id * 31 + r.i * 7919) % 20001 - 10000) AS a
           FROM p, unnest(range(0, n_samples)) AS r(i))
         SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(16 AS INT) AS bits,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(n_samples * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(max(a) AS BIGINT) AS peak_abs,
           CAST(sum(a) AS BIGINT) AS sum_abs
         FROM v GROUP BY doc_id, n_samples""",
    "m_audio_segments" ->
      """WITH a AS (
           SELECT doc_id, text,
             CAST((n_chars % 30 + 1) * 1000 AS BIGINT) AS duration_ms
           FROM documents)
         SELECT doc_id, duration_ms,
           unnest(generate_series(0, duration_ms - 1000, 500))
             AS seg_start,
           md5(text || ':' ||
             CAST(unnest(generate_series(0, duration_ms - 1000, 500))
               AS VARCHAR)) AS seg_feat
         FROM a""",
    "m_frame_sample" ->
      """WITH v AS (
           SELECT doc_id, text, n_chars % 120 + 1 AS n_frames
           FROM documents)
         SELECT doc_id, n_frames,
           unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx,
           md5(text || ':' ||
             CAST(unnest(generate_series(0, n_frames - 1, 10))
               AS VARCHAR)) AS frame_feat
         FROM v""",
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
