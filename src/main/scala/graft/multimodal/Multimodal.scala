package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed metadata for an opaque media payload column. */
case class MediaMeta(kind: String, width: Int, height: Int, declaredBytes: Long)

/** A multimodal record: id + opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Extracted features: container format + dims parsed from the real header
  * bytes, plus content statistics over the decoded body. */
case class MediaFeatures(
    doc_id: Long, format: String, n_bytes: Long, byte_mean: Double,
    byte_entropy: Double, width: Int, height: Int, decode_ok: Boolean)

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with typed
 * metadata, decoded partition-wise.
 *
 * The header decode is REAL: every payload starts with an actual PNG /
 * JPEG / GIF container header (built by [[ImageHeaders]]) and the decoder
 * parses format, width, and height back out of the bytes — magic sniff,
 * IHDR / SOFn-walk / logical-screen-descriptor, pure JVM. Only the pixel
 * decode proper is absent (no codec libs in this container): content
 * features are byte statistics over the body in place of pixel statistics,
 * computed with the same per-partition streaming shape a real codec
 * binding would use.
 */
object Multimodal {

  /** Build a multimodal table from documents: payload = a real image
    * container header (format cycles png/jpeg/gif with doc_id) followed by
    * the UTF-8 text bytes standing in for the encoded stream. The header
    * dims are derived from doc_id, so the oracle can verify that the
    * byte-level parse recovers them exactly. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val w = (id % 64 + 1).toInt
        val h = (id % 48 + 1).toInt
        val (kind, header) = (id % 3) match {
          case 0 => ("image", ImageHeaders.png(w, h))
          case 1 => ("audio", ImageHeaders.jpeg(w, h))
          case _ => ("video", ImageHeaders.gif(w, h))
        }
        MediaRecord(id, header ++ text.getBytes("UTF-8"), MediaMeta(kind, w, h, nChars))
      }
  }

  /** Decode one record: parse the container header from the payload bytes
    * (format + dims), then compute content statistics over the body. */
  private def decode(r: MediaRecord): MediaFeatures = {
    val parsed = ImageHeaders.parse(r.payload)
    val body = parsed.map(p => r.payload.drop(p.headerLen)).getOrElse(r.payload)
    val hist = new Array[Long](256)
    var sum = 0.0
    body.foreach { b => hist(b & 0xff) += 1; sum += (b & 0xff) }
    val n = body.length.toDouble
    var ent = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c / n; ent -= p * math.log(p) / math.log(2.0) }
    }
    MediaFeatures(r.doc_id,
      parsed.map(_.format).getOrElse("unknown"),
      body.length.toLong,
      if (n > 0) sum / n else 0.0, ent,
      parsed.map(_.width).getOrElse(0),
      parsed.map(_.height).getOrElse(0),
      decode_ok = parsed.isDefined)
  }

  /** m01: partition-wise decode + feature extraction. One decoder pass per
    * partition, streaming iterator (no materialization), executor-side
    * only; the emitted width/height/format are parsed from the actual
    * header bytes, not copied from metadata. */
  def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codecs are
        // expensive to construct; amortize across the partition)
        it.map(decode)
      }
      .select(col("doc_id"), col("format"), col("n_bytes"),
        round(col("byte_mean"), 4).as("byte_mean"),
        round(col("byte_entropy"), 4).as("byte_entropy"),
        col("width"), col("height"), col("decode_ok"))
      .orderBy(col("doc_id"))
  }

  /** Resize one record: strip the parsed header, then nearest-neighbor
    * subsample the body standing in for a pixel resize — keeps every
    * stride-th byte so output size scales with the target dims. */
  private def resize(r: MediaRecord, targetW: Int, targetH: Int): MediaRecord = {
    val headerLen = ImageHeaders.parse(r.payload).map(_.headerLen).getOrElse(0)
    val body = r.payload.drop(headerLen)
    val w = math.min(targetW, r.meta.width)
    val h = math.min(targetH, r.meta.height)
    val inPixels = math.max(1, r.meta.width * r.meta.height)
    val stride = math.max(1, inPixels / math.max(1, w * h))
    val out = body.indices.collect { case i if i % stride == 0 => body(i) }
    MediaRecord(r.doc_id, out.toArray, MediaMeta(r.meta.kind, w, h, out.length.toLong))
  }

  /** m02: resize pipeline — typed Dataset in, typed Dataset out, stride
    * computed from metadata; the scale-relevant property is that the
    * transform is a narrow map (no shuffle) and output bytes shrink with
    * the target resolution. */
  def resized(s: SparkSession, d: String, targetW: Int = 16, targetH: Int = 12): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions(it => it.map(resize(_, targetW, targetH)))
      .select(col("doc_id"), col("meta.kind").as("kind"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        length(col("payload")).as("n_bytes_out"))
      .orderBy(col("doc_id"))
  }

  /** (doc_id, dhash): the 64-bit difference hash over the decoded stream
    * (bit i set iff byte i > byte i+1 across a 65-byte prefix) — narrow
    * per-record hash; the 8-byte digest is all that ever leaves the scan.
    * Shared by m04 (exact-hash groups) and m07 (near-dup clusters). */
  private def dhashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions(it => it.map { r =>
        val headerLen = ImageHeaders.parse(r.payload).map(_.headerLen).getOrElse(0)
        val body = r.payload.drop(headerLen)
        var h = 0L
        var i = 0
        while (i < 64 && i + 1 < body.length) {
          if ((body(i) & 0xff) > (body(i + 1) & 0xff)) h |= (1L << i)
          i += 1
        }
        (r.doc_id, h)
      })
      .toDF("doc_id", "dhash")
  }

  /** m04: perceptual (difference-)hash dedup — the image near-dup pass of
    * a multimodal corpus pipeline: [[dhashes]] then exact-hash groups
    * counted. Real pixel dHash swaps the byte prefix for a resized luma
    * grid; the Spark shape is identical — narrow per-record hash, one
    * groupBy on the 8-byte digest (never the payload). */
  def perceptualHash(s: SparkSession, d: String): DataFrame =
    dhashes(s, d)
      .withColumn("n_same", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("dhash"))))
      .select(col("doc_id"), col("dhash"), col("n_same"))
      .orderBy(col("doc_id"))

  /** m07 near-dup edge threshold: images whose dHashes differ in ≤ 3 of
    * 64 bits are the same image under light recompression/crop jitter. */
  private val HamTau = 3

  /** m07: image near-duplicate CLUSTERS — the image-modality dedup
    * topology, composed from kernels already proven on text: [[dhashes]]
    * (narrow, 8-byte digests), the d03 pigeonhole banding (a 64-bit hash
    * splits into four 16-bit bands; ≤ `HamTau`=3 flipped bits can dirty at
    * most 3 bands, so true near-dups ALWAYS share ≥ 1 exact band — full
    * recall, no probabilistic miss), the d02 capped-bucket pair expansion
    * (no n² anywhere), a codegen xor+popcount Hamming verify, and d06's
    * pointer-jumping connected components over the edge-touched set only.
    * At 100 TB: payloads never shuffle, candidate pairs exist only inside
    * 16-bit-band buckets, components converge in O(log diameter) rounds. */
  def imageDupClusters(s: SparkSession, d: String): DataFrame = {
    val hashed = dhashes(s, d)
    val bands = hashed.select(col("doc_id"), posexplode(
      expr("transform(sequence(0, 3), b -> shiftright(dhash, b * 16) & 65535)"))
      .as(Seq("band", "band_key")))
    val verified = graft.dedup.Dedup.lshCandidatePairs(bands)
      .join(hashed.select(col("doc_id").as("id_a"), col("dhash").as("ha")), Seq("id_a"))
      .join(hashed.select(col("doc_id").as("id_b"), col("dhash").as("hb")), Seq("id_b"))
      .filter(graft.functions.GraftFunctions.hamming64(col("ha"), col("hb")) <= HamTau)
      .select(col("id_a"), col("id_b"))
    graft.dedup.Clustering.connectedComponents(hashed.select(col("doc_id")), verified)
      .orderBy(col("doc_id"))
  }

  /** m03: frame sampling — strip the container header, treat the body as F
    * fixed-size frames and keep every k-th (the video keyframe-extraction
    * topology). flatMap on the typed Dataset: one input row fans out to its
    * sampled frames, still a narrow transform. */
  def frameSample(s: SparkSession, d: String, frameBytes: Int = 64, every: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(col("meta.kind") === "video")
      .flatMap { r =>
        val headerLen = ImageHeaders.parse(r.payload).map(_.headerLen).getOrElse(0)
        r.payload.drop(headerLen).grouped(frameBytes).zipWithIndex
          .collect { case (frame, idx) if idx % every == 0 =>
            // 4dp mean in exact INTEGER space (the t24 discipline): byte
            // sums are exact longs, so round(S/n, 4) = (2·S·1e4 + n) div
            // (2n) half-up — rounding a double quotient forks engines on
            // .xxxx5 midpoints (e.g. n = 40 byte tail frames)
            val mean = if (frame.isEmpty) 0.0
              else {
                val sumB = frame.map(b => (b & 0xff).toLong).sum
                val n = frame.length.toLong
                ((2L * sumB * 10000L + n) / (2L * n)).toDouble / 10000.0
              }
            (r.doc_id, idx, frame.length, mean)
          }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_mean")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** m05: audio metadata extraction — the audio arm of the multimodal
    * ingest. Each payload carries a REAL RIFF/WAVE PCM header (built by
    * [[AudioHeaders]] with rate/channels derived from doc_id, so the
    * oracle verifies the byte-level parse recovers them exactly) over
    * text bytes standing in for PCM. The decoder is a narrow
    * partition-wise chunk walk that never reads the body — the 100 TB
    * first-pass shape for audio corpora. duration_us is integer
    * microseconds (exact arithmetic, no float jitter cross-engine). */
  def audioMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val rate = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
        val channels = (id % 2 + 1).toInt
        (id, AudioHeaders.wav(rate, channels, 16, nChars) ++ text.getBytes("UTF-8"))
      }
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          AudioHeaders.parseWav(bytes) match {
            case Some(p) =>
              (id, "wav", p.sampleRate, p.channels, p.bits, p.nSamples,
                p.nSamples * 1000000L / p.sampleRate, true)
            case None => (id, "unknown", 0, 0, 0, 0L, 0L, false)
          }
        }
      }
      .toDF("doc_id", "format", "sample_rate", "channels", "bits",
        "n_samples", "duration_us", "decode_ok")
      .orderBy(col("doc_id"))
  }

  /** m06: video metadata extraction — the video arm. Each payload is a
    * REAL MP4 (ISO-BMFF) structure built by [[VideoHeaders]] with
    * timescale/duration derived from doc_id; the decoder walks the box
    * tree (ftyp brand, moov → mvhd timing) and never opens mdat — the
    * 100 TB first-pass shape for video corpora. Integer-millisecond
    * durations keep the oracle float-free. */
  def videoMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val timescale = (id % 3) match { case 0 => 600; case 1 => 1000; case _ => 90000 }
        (id, VideoHeaders.mp4(timescale, nChars.toInt) ++ text.getBytes("UTF-8"))
      }
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          VideoHeaders.parseMp4(bytes) match {
            case Some(p) =>
              (id, p.brand, p.timescale, p.durationTicks,
                p.durationTicks * 1000L / p.timescale, true)
            case None => (id, "unknown", 0L, 0L, 0L, false)
          }
        }
      }
      .toDF("doc_id", "brand", "timescale", "duration_ticks", "duration_ms", "decode_ok")
      .orderBy(col("doc_id"))
  }

  /** m08: PCM waveform statistics — the second audio pass after m05's
    * header walk: strip the parsed RIFF header (at the offset the chunk
    * walk found, not a hardcoded 44), decode the body as little-endian
    * int16 samples, and report RMS energy, peak, DC offset, and clipping
    * ratio — the signals an audio-curation pipeline thresholds on
    * (silence, clipped takes, DC-biased mics). Decoding tolerates a
    * truncated body (declared sample count > actual bytes, the torn-file
    * case): it consumes whole 2-byte samples to payload end and drops a
    * trailing odd byte. Sum-of-squares accumulates in Long (exact — no
    * float summation order anywhere); the only doubles are the final
    * ratios. Pure narrow mapPartitions; only the 6-column stats row ever
    * leaves the scan. */
  def audioEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioEnergyOf(
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("n_chars"))
        .as[(Long, String, Long)]
        .map { case (id, text, nChars) =>
          val rate = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
          val channels = (id % 2 + 1).toInt
          (id, AudioHeaders.wav(rate, channels, 16, nChars) ++ text.getBytes("UTF-8"))
        })
  }

  /** m09: JPEG quality estimation from the DQT — the compression-quality
    * gate an image-curation pipeline thresholds on (drop thumbnails
    * re-encoded below q~60, keep originals). Each payload carries a REAL
    * quality-scaled DQT segment (built by [[ImageHeaders.jpegWithDqt]]
    * with quality derived from doc_id); the decoder walks the marker
    * segments to the DQT, de-zigzags the 64 coefficients to natural
    * order, and inverts the public IJG scaling formula (smallest q in
    * 1..100 minimizing L1 distance — ImageMagick's estimator). The oracle
    * replays the formula from the same Annex-K constants, so a defect in
    * the builder, the zigzag permutation, the marker walk, or the
    * estimator forks the hash. Narrow mapPartitions; only the 7-column
    * stats row leaves the scan — the 100 TB shape. */
  def jpegQuality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .filter(_._1 % 3 == 1)
      .map { case (id, text) =>
        val w = (id % 64 + 1).toInt
        val h = (id % 48 + 1).toInt
        val q = ((id * 37) % 96 + 3).toInt
        (id, ImageHeaders.jpegWithDqt(w, h, q) ++ text.getBytes("UTF-8"))
      }
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          ImageHeaders.parseDqt(bytes) match {
            case Some(tbl) =>
              (id, ImageHeaders.estimateJpegQuality(tbl),
                tbl.map(_.toLong).sum.toDouble / 64.0, tbl.min, tbl.max, 8, true)
            case None => (id, 0, 0.0, 0, 0, 0, false)
          }
        }
      }
      .toDF("doc_id", "quality_est", "dqt_mean", "dqt_min", "dqt_max",
        "dqt_precision", "decode_ok")
      .select(col("doc_id"), col("quality_est"),
        round(col("dqt_mean"), 4).as("dqt_mean"),
        col("dqt_min"), col("dqt_max"), col("dqt_precision"), col("decode_ok"))
      .orderBy(col("doc_id"))
  }

  /** m10: EXIF orientation + true-dimension extraction — the metadata
    * read an image pipeline runs before any pixel work (orientation 5..8
    * means the display frame is transposed; training crops that ignore it
    * learn rotated data). Each payload carries a REAL APP1 Exif segment
    * (built by [[ExifHeaders.jpegWithExif]] from doc_id: dims, orientation
    * cycling all 8 EXIF values, maker string, and BOTH TIFF byte orders —
    * real corpora mix II and MM); the decoder walks the JPEG markers to
    * the APP1 and parses the TIFF IFD byte-for-byte, including the
    * value-offset indirection for the ASCII Make. The oracle replays the
    * expected fields numerically from doc_id, so a defect anywhere in the
    * builder, the marker walk, the endian handling, or the IFD arithmetic
    * forks the hash. Narrow mapPartitions; payloads never shuffle — only
    * the parsed metadata row leaves the scan (the 100 TB shape). */
  def exifMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .filter(_._1 % 5 == 2)
      .map { case (id, text) =>
        val w = (id % 512 + 16).toInt
        val h = (id % 384 + 16).toInt
        val orient = (id % 8 + 1).toInt
        val make = s"maker${id % 7}"
        val be = id % 2 == 0
        (id, ExifHeaders.jpegWithExif(w, h, orient, make, be) ++
          text.getBytes("UTF-8"))
      }
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          ExifHeaders.parse(bytes) match {
            case Some(x) =>
              val transposed = x.orientation >= 5
              val dispW = if (transposed) x.height else x.width
              val dispH = if (transposed) x.width else x.height
              (id, x.byteOrder, x.orientation, x.width, x.height,
                dispW, dispH, x.make, x.nEntries, true)
            case None => (id, "", 0, 0L, 0L, 0L, 0L, "", 0, false)
          }
        }
      }
      .toDF("doc_id", "byte_order", "orientation", "width", "height",
        "disp_width", "disp_height", "make", "n_entries", "decode_ok")
      .orderBy(col("doc_id"))
  }

  /** The m08 kernel over any (id, wav-payload) Dataset — the
    * unit-testable form (the spec feeds hand-built PCM and checks the
    * decoded stats against hand-computed values). */
  def audioEnergyOf(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          AudioHeaders.parseWav(bytes) match {
            case Some(p) =>
              val body = bytes.drop(p.headerLen)
              val n = body.length / 2
              var i = 0; var ss = 0L; var sv = 0L; var peak = 0L; var clip = 0L
              while (i < n) {
                val raw = (body(2 * i) & 0xff) | ((body(2 * i + 1) & 0xff) << 8)
                val v = if (raw >= 32768) raw - 65536 else raw
                ss += v.toLong * v; sv += v
                val a = math.abs(v).toLong
                if (a > peak) peak = a
                if (a >= 30000) clip += 1
                i += 1
              }
              (id, n.toLong, peak,
                if (n > 0) math.sqrt(ss.toDouble / n) else 0.0,
                if (n > 0) sv.toDouble / n else 0.0,
                if (n > 0) clip.toDouble / n else 0.0, true)
            case None => (id, 0L, 0L, 0.0, 0.0, 0.0, false)
          }
        }
      }
      .toDF("doc_id", "n_samples16", "peak", "rms", "dc_mean", "clip_ratio", "decode_ok")
      .select(col("doc_id"), col("n_samples16"), col("peak"),
        round(col("rms"), 4).as("rms"), round(col("dc_mean"), 4).as("dc_mean"),
        round(col("clip_ratio"), 6).as("clip_ratio"), col("decode_ok"))
      .orderBy(col("doc_id"))
  }
}
