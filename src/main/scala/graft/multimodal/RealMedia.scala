package graft.multimodal

/** REAL decoders for the media containers that need no codec library —
  * uncompressed BMP (BITMAPINFOHEADER, 24bpp BI_RGB) and RIFF WAV (PCM16) —
  * plus a pixel/sample-level feature per payload, so the multimodal path
  * demonstrates actual byte-level media decoding end-to-end inside this
  * container. Formats that genuinely require codecs (JPEG/PNG/MP3/MP4)
  * still fall back to [[MediaDecoder]]'s declared deterministic stub; this
  * object is the proof the swap-in seam carries a real decoder unchanged.
  *
  * Both parsers are defensive the way the PDF stack is: bounds-checked
  * little-endian reads, malformed/truncated/unsupported payloads return
  * None (an error surface, never a throw), and the WAV chunk walk skips
  * unknown chunks (real files carry LIST/INFO junk before `fmt `). */
object RealMedia {

  /** `feature`: BMP = sum of the blue channel over all pixels (row padding
    * excluded — a decoder that misreads the 4-byte row stride cannot
    * produce this sum); WAV = peak absolute sample amplitude. */
  final case class Decoded(container: String, width: Long, height: Long,
      sampleRate: Long, nSamples: Long, feature: Long)

  def decode(payload: Array[Byte]): Option[Decoded] =
    if (isBmp(payload)) decodeBmp(payload)
    else if (isWav(payload)) decodeWav(payload)
    else None

  private def isBmp(p: Array[Byte]): Boolean =
    p.length >= 54 && p(0) == 'B' && p(1) == 'M'

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  private def u16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  private def u32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)

  private def s16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) | (p(off + 1) << 8)).toShort.toInt

  private def decodeBmp(p: Array[Byte]): Option[Decoded] = {
    val offBits = u32(p, 10)
    val dibSize = u32(p, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER et al. unsupported
    val w = u32(p, 18).toInt
    val h = u32(p, 22).toInt // positive = bottom-up (the only form we emit)
    val bpp = u16(p, 28)
    val compression = u32(p, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    val rowSize = ((w * 3 + 3) / 4) * 4 // rows padded to 4-byte stride
    if (offBits < 54 || offBits + rowSize.toLong * h > p.length) return None
    var sum = 0L
    var y = 0
    while (y < h) {
      val base = offBits.toInt + y * rowSize
      var x = 0
      while (x < w) {
        sum += (p(base + x * 3) & 0xff) // blue channel (BGR order)
        x += 1
      }
      y += 1
    }
    Some(Decoded("bmp", w, h, 0L, 0L, sum))
  }

  private def decodeWav(p: Array[Byte]): Option[Decoded] = {
    // RIFF chunk walk: unknown chunks (LIST, fact, ...) skipped; chunks are
    // word-aligned (odd sizes carry a pad byte)
    var off = 12
    var sampleRate = -1L
    var channels = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= p.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(p, off + 4)
      val body = off + 8
      if (body + size > p.length) return None // truncated chunk
      if (id == "fmt ") {
        if (size < 16 || u16(p, body) != 1) return None // PCM only
        channels = u16(p, body + 2)
        sampleRate = u32(p, body + 4)
        bits = u16(p, body + 14)
      } else if (id == "data") {
        dataOff = body
        dataLen = size
      }
      off = body + size.toInt + (size.toInt & 1)
    }
    if (sampleRate < 0 || dataOff < 0 || channels != 1 || bits != 16) return None
    val n = dataLen / 2
    var peak = 0L
    var i = 0
    while (i < n) {
      val a = math.abs(s16(p, dataOff + i * 2).toLong)
      if (a > peak) peak = a
      i += 1
    }
    Some(Decoded("wav", 0L, 0L, sampleRate, n, peak))
  }
}
