package graft.multimodal

/**
 * Pure-JVM video container header codec: build and parse real MP4
 * (ISO-BMFF) box structures — the video counterpart of [[ImageHeaders]] /
 * [[AudioHeaders]]. No codec libraries: this is a byte-layout walk of the
 * public ISO base-media format.
 *
 * The parser does what a video-ingest first pass does: walk the top-level
 * box list (each box = 32-bit big-endian size + 4-char type), descend
 * into `moov` → `mvhd`, and read (timescale, duration) — both v0 (32-bit)
 * and v1 (64-bit) layouts — without ever touching `mdat`. At 100 TB of
 * video the difference between "parse 116 header bytes" and "read the
 * sample data" is the whole pipeline cost.
 */
object VideoHeaders {

  /** Parsed MP4 movie header: brand from ftyp + mvhd timing. */
  final case class ParsedMp4(brand: String, timescale: Long, durationTicks: Long)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  /** Minimal valid MP4: ftyp(isom) + moov[mvhd v0] + empty-ish mdat. */
  def mp4(timescale: Int, durationTicks: Int): Array[Byte] = {
    val ftyp = be32(20) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII")
    val mvhdBody =
      be32(0) ++                       // version 0 + flags
      be32(0) ++ be32(0) ++            // creation / modification
      be32(timescale) ++ be32(durationTicks) ++
      be32(0x00010000) ++              // rate 1.0
      Array[Byte](1, 0) ++             // volume 1.0
      new Array[Byte](10) ++           // reserved
      (be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000)) ++ // identity matrix
      new Array[Byte](24) ++           // pre_defined
      be32(2)                          // next_track_ID
    val mvhd = be32(8 + mvhdBody.length) ++ "mvhd".getBytes("US-ASCII") ++ mvhdBody
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    val mdat = be32(8) ++ "mdat".getBytes("US-ASCII")
    ftyp ++ moov ++ mdat
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def rdBe32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
  private def rdBe64(b: Array[Byte], i: Int): Long =
    (rdBe32(b, i) << 32) | rdBe32(b, i + 4)
  private def boxType(b: Array[Byte], i: Int): String =
    if (i + 8 <= b.length) new String(b.slice(i + 4, i + 8), "US-ASCII") else ""

  /** Walk `b[from until to)` as a box list; return the (payload offset,
    * payload end) of the first box of `wanted`. */
  private def findBox(b: Array[Byte], from: Int, to: Int, wanted: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val sz = rdBe32(b, i)
      if (sz < 8 || i + sz > to) return None // malformed size: stop, don't guess
      if (boxType(b, i) == wanted) return Some((i + 8, i + sz.toInt))
      i += sz.toInt
    }
    None
  }

  /** Parse brand + movie timing from MP4 bytes; None unless a well-formed
    * ftyp and a moov/mvhd are present. */
  def parseMp4(b: Array[Byte]): Option[ParsedMp4] =
    for {
      (ftypOff, _) <- findBox(b, 0, b.length, "ftyp")
      brand = new String(b.slice(ftypOff, ftypOff + 4), "US-ASCII")
      (moovOff, moovEnd) <- findBox(b, 0, b.length, "moov")
      (mvhdOff, mvhdEnd) <- findBox(b, moovOff, moovEnd, "mvhd")
      version = u8(b, mvhdOff)
      parsed <- version match {
        case 0 if mvhdEnd - mvhdOff >= 20 =>
          Some(ParsedMp4(brand, rdBe32(b, mvhdOff + 12), rdBe32(b, mvhdOff + 16)))
        case 1 if mvhdEnd - mvhdOff >= 32 =>
          Some(ParsedMp4(brand, rdBe32(b, mvhdOff + 20), rdBe64(b, mvhdOff + 24)))
        case _ => None
      }
    } yield parsed
}
