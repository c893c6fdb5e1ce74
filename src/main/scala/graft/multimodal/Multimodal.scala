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
}
