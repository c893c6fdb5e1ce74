package graft.multimodal

/**
 * Pure-JVM EXIF/TIFF IFD codec: build and parse real APP1 Exif segments
 * (no metadata library — a byte-layout walk of the public TIFF 6.0 / EXIF
 * 2.3 structures, the same first-pass read every image-ingest pipeline
 * runs to learn orientation and true pixel dims before any decode).
 *
 * Both byte orders ("II" little-endian, "MM" big-endian) are built and
 * parsed — real corpora mix them (phone makers ship II, several camera
 * lines ship MM). ASCII values longer than 4 bytes exercise the
 * value-offset indirection, the part of TIFF naive readers get wrong.
 */
object ExifHeaders {

  /** Result of an EXIF parse: byte order, the orientation tag (1..8),
    * pixel dims from the IFD, the Make string, and the entry count. */
  final case class Exif(byteOrder: String, orientation: Int,
                        width: Long, height: Long, make: String, nEntries: Int)

  // TIFF tag ids (TIFF 6.0 §8; EXIF 2.3 table 4)
  private val TagImageWidth = 0x0100
  private val TagImageLength = 0x0101
  private val TagMake = 0x010f
  private val TagOrientation = 0x0112

  // ---- builder ----

  private def n16(v: Int, be: Boolean): Array[Byte] =
    if (be) Array((v >>> 8).toByte, v.toByte) else Array(v.toByte, (v >>> 8).toByte)
  private def n32(v: Long, be: Boolean): Array[Byte] = {
    val b = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    if (be) b else b.reverse
  }

  /** One 12-byte IFD entry with an inline value (SHORT left-justified in
    * the 4-byte field per TIFF 6.0 §2, i.e. first in wire order). */
  private def entryInline(tag: Int, typ: Int, value: Long, be: Boolean): Array[Byte] =
    n16(tag, be) ++ n16(typ, be) ++ n32(1, be) ++
      (if (typ == 3) n16(value.toInt, be) ++ Array[Byte](0, 0) else n32(value, be))

  /** The TIFF body of an Exif APP1: header, one IFD with ImageWidth (LONG),
    * ImageLength (LONG), Make (ASCII via value offset), Orientation
    * (SHORT), entries in ascending tag order as the spec requires. */
  def tiffBody(w: Long, h: Long, orientation: Int, make: String,
               bigEndian: Boolean): Array[Byte] = {
    val be = bigEndian
    val order = if (be) "MM" else "II"
    val makeBytes = make.getBytes("US-ASCII") :+ 0.toByte // NUL-terminated ASCII
    val nEntries = 4
    // layout: 8-byte header, 2-byte count, 4 entries x 12, 4-byte next-IFD,
    // then the out-of-line Make value
    val makeOffset = 8 + 2 + nEntries * 12 + 4
    val header = order.getBytes("US-ASCII") ++ n16(42, be) ++ n32(8, be)
    // TIFF 6.0 §2: values of <= 4 bytes are stored INLINE in the value
    // field (left-justified, zero-padded); longer values go out-of-line
    // via offset — both paths are real-corpus shapes, so build both.
    val makeValue =
      if (makeBytes.length <= 4) makeBytes.padTo(4, 0.toByte)
      else n32(makeOffset, be)
    val entries =
      entryInline(TagImageWidth, 4, w, be) ++
      entryInline(TagImageLength, 4, h, be) ++
      (n16(TagMake, be) ++ n16(2, be) ++ n32(makeBytes.length, be) ++
        makeValue) ++
      entryInline(TagOrientation, 3, orientation, be)
    header ++ n16(nEntries, be) ++ entries ++ n32(0, be) ++
      (if (makeBytes.length <= 4) Array.empty[Byte] else makeBytes)
  }

  /** JPEG with a real Exif APP1 right after SOI (the layout cameras emit),
    * followed by the JFIF/SOF tail [[ImageHeaders.jpeg]] builds — so the
    * plain dim parser still works on these payloads. */
  def jpegWithExif(w: Int, h: Int, orientation: Int, make: String,
                   bigEndian: Boolean): Array[Byte] = {
    val tiff = tiffBody(w, h, orientation, make, bigEndian)
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val app1 = Array(0xff, 0xe1).map(_.toByte) ++
      Array(((payload.length + 2) >>> 8).toByte, (payload.length + 2).toByte) ++ payload
    val plain = ImageHeaders.jpeg(w, h)
    plain.take(2) ++ app1 ++ plain.drop(2)
  }

  // ---- parser ----

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def rd16(b: Array[Byte], i: Int, be: Boolean): Int =
    if (be) (u8(b, i) << 8) | u8(b, i + 1) else u8(b, i) | (u8(b, i + 1) << 8)
  private def rd32(b: Array[Byte], i: Int, be: Boolean): Long =
    if (be) ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
    else ((u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) |
      (u8(b, i + 1) << 8) | u8(b, i)) & 0xffffffffL

  /** Walk the JPEG marker segments to the first APP1 whose payload starts
    * "Exif\0\0" and parse its TIFF IFD0. None on truncated input, missing
    * or non-Exif APP1, bad byte-order mark, or out-of-bounds offsets —
    * never throws (the corrupt-blob contract of [[ImageHeaders.parse]]). */
  def parse(b: Array[Byte]): Option[Exif] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 4 <= b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      val segLen = (u8(b, i + 2) << 8) | u8(b, i + 3)
      if (marker == 0xe1 && i + 2 + segLen <= b.length && segLen >= 2 + 6 + 8 &&
          new String(b, i + 4, 4, "US-ASCII") == "Exif" &&
          u8(b, i + 8) == 0 && u8(b, i + 9) == 0)
        return parseTiff(java.util.Arrays.copyOfRange(b, i + 10, i + 2 + segLen))
      i += 2 + segLen
    }
    None
  }

  /** Parse a bare TIFF body (header + IFD0) — the unit the builder emits. */
  def parseTiff(t: Array[Byte]): Option[Exif] = {
    if (t.length < 8) return None
    val order = new String(t, 0, 2, "US-ASCII")
    val be = order match {
      case "MM" => true
      case "II" => false
      case _ => return None
    }
    if (rd16(t, 2, be) != 42) return None
    val ifd = rd32(t, 4, be)
    if (ifd + 2 > t.length) return None
    val n = rd16(t, ifd.toInt, be)
    if (ifd + 2 + n * 12 + 4 > t.length) return None
    var orientation = 0; var w = 0L; var h = 0L; var make = ""
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + e * 12
      // entry layout: tag u16, type u16, count u32, value/offset u32
      val tag = rd16(t, off, be)
      val typ = rd16(t, off + 2, be)
      val cnt = rd32(t, off + 4, be)
      val voff = off + 8
      tag match {
        case TagOrientation if typ == 3 => orientation = rd16(t, voff, be)
        case TagImageWidth =>
          w = if (typ == 3) rd16(t, voff, be).toLong else rd32(t, voff, be)
        case TagImageLength =>
          h = if (typ == 3) rd16(t, voff, be).toLong else rd32(t, voff, be)
        case TagMake if typ == 2 =>
          val p = if (cnt <= 4) voff.toLong else rd32(t, voff, be)
          if (p + cnt <= t.length && cnt >= 1)
            make = new String(t, p.toInt, cnt.toInt - 1, "US-ASCII") // drop NUL
        case _ => ()
      }
      e += 1
    }
    Some(Exif(order, orientation, w, h, make, n))
  }
}
