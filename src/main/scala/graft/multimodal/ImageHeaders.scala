package graft.multimodal

/**
 * Pure-JVM image container header codec: build and parse real PNG / JPEG /
 * GIF headers (no codec libraries involved — these are byte-layout parses
 * of the public container formats).
 *
 * The parser is what a 100 TB media-ingest pipeline runs in its first
 * narrow pass: sniff magic bytes, pull (format, width, height) out of the
 * header, and hand the payload on — no full decode, no external library,
 * codegen-friendly per-row work.
 */
object ImageHeaders {

  /** Result of a header parse: container format, pixel dims, and the
    * header's byte length (the decoded body starts at `headerLen`). */
  final case class Parsed(format: String, width: Int, height: Int, headerLen: Int)

  // ---- builders (synthesize real headers for the test corpus) ----

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  /** PNG signature + IHDR chunk (length, type, 13-byte data, real CRC32). */
  def png(w: Int, h: Int): Array[Byte] = {
    val data = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32
    crc.update(typeAndData)
    PngSig ++ be32(data.length) ++ typeAndData ++ be32(crc.getValue.toInt)
  }

  /** JPEG SOI + JFIF APP0 + SOF0 (baseline) frame header with the dims. */
  def jpeg(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    soi ++ app0 ++ sof0
  }

  /** GIF89a logical screen descriptor (little-endian dims, no color table). */
  def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)

  // ---- JPEG quantization tables (DQT) ----

  /** The standard luminance quantization table (JPEG spec Annex K, table
    * K.1) in natural row-major order — the base every IJG-family encoder
    * scales by its quality setting. */
  val JpegStdLuminance: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Zigzag scan order: natural (row-major) index for each of the 64
    * zigzag positions (JPEG spec figure 5; libjpeg's jpeg_natural_order).
    * DQT segments store coefficients in THIS order on the wire. */
  val JpegZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** IJG quality scaling (libjpeg `jpeg_quality_scaling` +
    * `jpeg_add_quant_table`, public since 1991): quality 1..100 scales the
    * base table by `5000/q` below 50 and `200-2q` above, each coefficient
    * clamped to [1, 255] (force_baseline). Integer arithmetic throughout —
    * the oracle replays it bit-for-bit. */
  def jpegQuantTable(quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    JpegStdLuminance.map(b => math.max(1, math.min(255, (b * scale + 50) / 100)))
  }

  /** DQT marker segment for the quality-scaled luminance table: FFDB,
    * length 67, Pq/Tq = 0x00 (8-bit, table 0), 64 coefficient bytes in
    * zigzag wire order. */
  private def dqtSegment(quality: Int): Array[Byte] = {
    val tbl = jpegQuantTable(quality)
    Array(0xff, 0xdb).map(_.toByte) ++ be16(67) ++ Array[Byte](0x00) ++
      JpegZigZag.map(nat => tbl(nat).toByte)
  }

  /** JPEG header with a real quality-scaled DQT between APP0 and SOF0 —
    * the layout every IJG-family encoder emits. [[parse]] still recovers
    * the dims (the SOF walk skips the DQT like any other segment); the
    * quality pipeline reads the table back with [[parseDqt]]. */
  def jpegWithDqt(w: Int, h: Int, quality: Int): Array[Byte] = {
    val full = jpeg(w, h)
    val sofStart = full.length - (2 + 17) // SOF0 marker + its 17-byte segment
    full.take(sofStart) ++ dqtSegment(quality) ++ full.drop(sofStart)
  }

  /** Walk the marker segments to the first DQT and return the 8-bit
    * luminance table de-zigzagged to natural order. None on truncated
    * input, missing DQT, or a 16-bit (Pq=1) table. */
  def parseDqt(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 4 <= b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      val segLen = rdBe16(b, i + 2)
      if (marker == 0xdb) {
        val pq = u8(b, i + 4) >> 4
        if (pq != 0 || segLen < 67 || i + 4 + 1 + 64 > b.length) return None
        val nat = new Array[Int](64)
        var z = 0
        while (z < 64) { nat(JpegZigZag(z)) = u8(b, i + 5 + z); z += 1 }
        return Some(nat)
      }
      i += 2 + segLen
    }
    None
  }

  /** Estimate the encoder's quality setting from a parsed quantization
    * table: the smallest q in 1..100 whose IJG-scaled standard table
    * minimizes L1 distance to the observed one (ImageMagick's estimator
    * runs this same inversion). Exact tables recover q exactly; ties and
    * off-formula tables resolve deterministically to the smallest q. */
  def estimateJpegQuality(tbl: Array[Int]): Int = {
    var bestQ = 1
    var bestD = Long.MaxValue
    var q = 1
    while (q <= 100) {
      val cand = jpegQuantTable(q)
      var d = 0L
      var i = 0
      while (i < 64) { d += math.abs(cand(i) - tbl(i)); i += 1 }
      if (d < bestD) { bestD = d; bestQ = q }
      q += 1
    }
    bestQ
  }

  // ---- parser ----

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def rdBe32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def rdBe16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def rdLe16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** Sniff the container magic and parse (format, width, height) from the
    * actual header bytes. Returns None on anything unrecognized/truncated —
    * never throws (a corrupt blob in a 100 TB scan must not kill the task). */
  def parse(bytes: Array[Byte]): Option[Parsed] =
    if (bytes.length >= 24 && bytes.startsWith(PngSig)) parsePng(bytes)
    else if (bytes.length >= 4 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) parseJpeg(bytes)
    else if (bytes.length >= 13 && (bytes.startsWith("GIF89a".getBytes("US-ASCII")) ||
      bytes.startsWith("GIF87a".getBytes("US-ASCII")))) parseGif(bytes)
    else None

  private def parsePng(b: Array[Byte]): Option[Parsed] = {
    val len = rdBe32(b, 8)
    val isIhdr = new String(b, 12, 4, "US-ASCII") == "IHDR"
    if (!isIhdr || b.length < 16 + len + 4) None
    else Some(Parsed("png", rdBe32(b, 16), rdBe32(b, 20), 8 + 4 + 4 + len + 4))
  }

  /** Walk JPEG marker segments to the first SOFn (C0..CF minus C4/C8/CC)
    * and read (precision, height, width) from the frame header. */
  private def parseJpeg(b: Array[Byte]): Option[Parsed] = {
    var i = 2
    while (i + 4 <= b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      val segLen = rdBe16(b, i + 2)
      val isSof = marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      if (isSof) {
        if (i + 2 + 7 > b.length) return None
        val h = rdBe16(b, i + 5)
        val w = rdBe16(b, i + 7)
        return Some(Parsed("jpeg", w, h, i + 2 + segLen))
      }
      i += 2 + segLen
    }
    None
  }

  private def parseGif(b: Array[Byte]): Option[Parsed] =
    Some(Parsed("gif", rdLe16(b, 6), rdLe16(b, 8), 13))
}
