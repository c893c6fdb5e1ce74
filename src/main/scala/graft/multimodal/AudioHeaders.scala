package graft.multimodal

/**
 * Pure-JVM audio container header codec: build and parse real RIFF/WAVE
 * (PCM) headers — the audio counterpart of [[ImageHeaders]], same
 * byte-layout discipline, no codec libraries.
 *
 * The parser is the first narrow pass of an audio-ingest pipeline: sniff
 * the RIFF magic, walk the chunk list to `fmt ` and `data`, and emit
 * (sample rate, channels, bit depth, sample count) without touching the
 * PCM body. Chunk walking is generic (chunks in any order, unknown
 * chunks skipped by their declared size), as real WAV files require.
 */
object AudioHeaders {

  /** Parsed PCM WAV header: format params + sample count + the offset
    * where the PCM body starts. */
  final case class ParsedWav(sampleRate: Int, channels: Int, bits: Int,
                             nSamples: Long, headerLen: Int)

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** Canonical 44-byte RIFF/WAVE PCM header declaring `nSamples` frames. */
  def wav(sampleRate: Int, channels: Int, bits: Int, nSamples: Long): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = (nSamples * blockAlign).toInt
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataSize) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(dataSize)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def rdLe16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def rdLe32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xffffffffL

  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length) new String(b.slice(i, i + 4), "US-ASCII") else ""

  /** Parse a PCM WAV header from the payload bytes; None if the bytes are
    * not a well-formed RIFF/WAVE with a PCM `fmt ` chunk and a `data`
    * chunk. The walk tolerates extra chunks (LIST, fact, …) in any order
    * before `data`. */
  def parseWav(b: Array[Byte]): Option[ParsedWav] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataSize = -1L; var dataOff = -1
    while (i + 8 <= b.length && (dataOff < 0 || rate < 0)) {
      val t = tag(b, i)
      val sz = rdLe32(b, i + 4)
      if (t == "fmt " && sz >= 16 && i + 8 + 16 <= b.length) {
        if (rdLe16(b, i + 8) != 1) return None // PCM only
        channels = rdLe16(b, i + 10)
        rate = rdLe32(b, i + 12).toInt
        bits = rdLe16(b, i + 22)
      } else if (t == "data") {
        dataSize = sz
        dataOff = i + 8
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || dataOff < 0) None
    else {
      val blockAlign = channels * bits / 8
      if (blockAlign <= 0) None
      else Some(ParsedWav(rate, channels, bits, dataSize / blockAlign, dataOff))
    }
  }
}
