package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed metadata for an opaque media payload column. */
case class MediaMeta(kind: String, width: Int, height: Int, declaredBytes: Long)

/** A multimodal record: id + opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Extracted features (what a real decoder would emit). */
case class MediaFeatures(
    doc_id: Long, n_bytes: Long, byte_mean: Double, byte_entropy: Double,
    width: Int, height: Int, decode_ok: Boolean)

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, decoded partition-wise.
 *
 * The decode step is a STUB (no media libs in this container): a
 * deterministic fake that treats the payload bytes as the "decoded frame"
 * and computes real statistics over them. The Spark-side shape — binary
 * column, typed metadata struct, per-partition batched decode via
 * mapPartitions on a typed Dataset, no driver collection — is the real,
 * scale-tested plumbing; swap [[decodeStub]] for an actual codec binding
 * to productionize.
 */
object Multimodal {

  /** Build a multimodal table from documents: payload = UTF-8 bytes of the
    * text standing in for encoded media; metadata derived deterministically. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          (col("doc_id") % 64 + 1).cast("int").as("width"),
          (col("doc_id") % 48 + 1).cast("int").as("height"),
          col("n_chars").as("declaredBytes")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decoder: deterministic fake standing in for image/audio decode.
    * Returns per-payload byte statistics (mean, entropy) as the "features". */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val hist = new Array[Long](256)
    var sum = 0.0
    bytes.foreach { b => hist(b & 0xff) += 1; sum += (b & 0xff) }
    val n = bytes.length.toDouble
    var ent = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c / n; ent -= p * math.log(p) / math.log(2.0) }
    }
    MediaFeatures(r.doc_id, bytes.length.toLong,
      if (n > 0) sum / n else 0.0, ent,
      r.meta.width, r.meta.height, decode_ok = bytes.nonEmpty)
  }

  /** m01: partition-wise decode + feature extraction. Batch shape matches a
    * real codec integration: one decoder instance per partition, streaming
    * iterator (no materialization), executor-side only. */
  def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions { it =>
        // per-partition "decoder" init would go here (real codecs are
        // expensive to construct; amortize across the partition)
        it.map(decodeStub)
      }
      .select(col("doc_id"), col("n_bytes"), round(col("byte_mean"), 4).as("byte_mean"),
        round(col("byte_entropy"), 4).as("byte_entropy"),
        col("width"), col("height"), col("decode_ok"))
      .orderBy(col("doc_id"))
  }

  /** STUB resize: nearest-neighbor subsampling of the payload standing in
    * for an image resize — keeps every stride-th byte so output size scales
    * with the target dims, deterministically. */
  private def resizeStub(r: MediaRecord, targetW: Int, targetH: Int): MediaRecord = {
    val w = math.min(targetW, r.meta.width)
    val h = math.min(targetH, r.meta.height)
    val inPixels = math.max(1, r.meta.width * r.meta.height)
    val stride = math.max(1, inPixels / math.max(1, w * h))
    val out = r.payload.indices.collect { case i if i % stride == 0 => r.payload(i) }
    MediaRecord(r.doc_id, out.toArray, MediaMeta(r.meta.kind, w, h, out.length.toLong))
  }

  /** m02: resize pipeline — typed Dataset in, typed Dataset out, decoder
    * stride computed from metadata; the scale-relevant property is that the
    * transform is a narrow map (no shuffle) and output bytes shrink with
    * the target resolution. */
  def resized(s: SparkSession, d: String, targetW: Int = 16, targetH: Int = 12): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions(it => it.map(resizeStub(_, targetW, targetH)))
      .select(col("doc_id"), col("meta.kind").as("kind"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        length(col("payload")).as("n_bytes_out"))
      .orderBy(col("doc_id"))
  }

  /** m03: frame sampling — treat the payload as F fixed-size frames and
    * keep every k-th (the video keyframe-extraction topology). flatMap on
    * the typed Dataset: one input row fans out to its sampled frames,
    * still a narrow transform. */
  def frameSample(s: SparkSession, d: String, frameBytes: Int = 64, every: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(col("meta.kind") === "video")
      .flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex
          .collect { case (frame, idx) if idx % every == 0 =>
            val mean = if (frame.isEmpty) 0.0
              else frame.map(b => (b & 0xff).toDouble).sum / frame.length
            (r.doc_id, idx, frame.length, mean)
          }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_mean")
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
        round(col("frame_mean"), 4).as("frame_mean"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
