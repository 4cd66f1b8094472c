package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: media as opaque `binary` content + typed
  * metadata, decoded in BATCHES inside `mapPartitions` — the Spark-side
  * shape (schema, partitioning, batched decoder signature) is real and
  * oracle-verified; only the codec itself is a STUB (this container has
  * no image/audio libraries), marked below.
  *
  * The stub decoder derives features purely from the content bytes, so
  * the DuckDB oracle reproduces it from the same md5 hex — the
  * plumbing's determinism is driver-verified even though the codec is
  * fake.
  *
  * At 100 TB: content bytes stay columnar until the decode stage;
  * `repartition` spreads decode work; each partition decodes in
  * fixed-size batches exactly like a vectorized (Arrow/pandas-style)
  * UDF would receive them.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte], duration_ms: Long)
  case class MediaFeatures(doc_id: Long, media_type: String, width: Int, height: Int,
                           brightness: Double, n_frames: Int, feature_hash: Long)

  val DecodeBatchSize = 64

  /** Synthesized media table over documents: 16 "media bytes" per doc
    * (md5 digest), a modality by doc_id, and duration metadata. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      unhex(md5(col("text"))).as("content"),
      (col("n_chars") * 10).as("duration_ms"))

  /** STUB codec: a real implementation would call an image/audio/video
    * library here (absent in this container). Features are derived
    * deterministically from the content bytes so the whole pipeline
    * stays verifiable. Signature is batch-shaped: Seq[MediaRow] →
    * Seq[MediaFeatures], like a vectorized decode UDF.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      def b(i: Int): Int = m.content(i) & 0xff
      val nFrames = if (m.media_type == "video") 1 + (b(3) >> 4) else 1
      MediaFeatures(
        doc_id = m.doc_id,
        media_type = m.media_type,
        width = 64 + b(0),
        height = 64 + b(1),
        brightness = b(2).toDouble / 255.0,
        n_frames = nFrames,
        feature_hash = ((b(4).toLong << 24) | (b(5).toLong << 16) |
          (b(6).toLong << 8) | b(7).toLong))
    }

  /** Decode pipeline: partition → batch → (stub) decode. */
  def mediaFeatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    mediaTable(documents).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
      .toDF()
  }

  val ThumbW = 64
  val ThumbH = 64

  /** Resize-to-thumbnail plumbing (STUB codec, real dataflow): the
    * "resized" content is a deterministic digest of (content, target
    * dims) — a real codec would decode, scale, and re-encode here; the
    * column shapes, the binary-in/binary-out contract, and the
    * determinism the oracle checks are the production ones. The output
    * carries the content digest (hex) rather than the bytes so the
    * driver's hash gate can compare it to SQL. */
  def mediaResized(documents: DataFrame): DataFrame =
    mediaTable(documents).select(
      col("doc_id"), col("media_type"),
      lit(ThumbW).as("width"), lit(ThumbH).as("height"),
      // digest over the content's hex form + dims: DuckDB's md5 is
      // varchar-only, so the stub hashes the same UTF-8 string in
      // both engines (a real codec outputs bytes, not a digest)
      md5(concat(lower(hex(col("content"))), lit(s"${ThumbW}x$ThumbH")))
        .as("content_hash"))

  val FrameSampleMax = 4

  /** Frame sampling for video rows: up to [[FrameSampleMax]] evenly
    * strided frame indices from the stub decoder's n_frames, each with
    * its timestamp offset and a deterministic per-frame content digest.
    * The explode is a Catalyst Generator — one scan, distributed, no
    * per-row driver logic; a real codec would replace the digest with
    * the extracted frame bytes. */
  def mediaFrames(documents: DataFrame): DataFrame = {
    val media = mediaTable(documents).filter(col("media_type") === "video")
      // stub n_frames: high nibble of content byte 3 (= hex digit 7 of
      // the digest), as in decodeBatch / the mediaFeatures oracle
      .withColumn("n_frames",
        (lit(1) + conv(substring(hex(col("content")), 7, 1), 16, 10).cast("int"))
          .cast("int"))
    val stride = ((col("n_frames") + FrameSampleMax - 1) / FrameSampleMax).cast("int")
    media
      .select(col("doc_id"), col("content"), col("duration_ms"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, stride)).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        (col("duration_ms") * col("frame_idx") / col("n_frames")).cast("long")
          .as("frame_ts_ms"),
        md5(concat(lower(hex(col("content"))), col("frame_idx").cast("string")))
          .as("frame_hash"))
  }
}
