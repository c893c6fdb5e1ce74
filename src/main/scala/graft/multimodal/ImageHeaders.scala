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
