package graft.multimodal

/** REAL decoders for media formats, no codec library: uncompressed BMP
  * (BITMAPINFOHEADER, 24bpp BI_RGB), RIFF WAV (PCM16), PNG (8-bit
  * truecolor, zlib via java.util.zip + all five row filters), GIF
  * (87a/89a, hand-rolled variable-width LZW), baseline grayscale JPEG
  * ([[Jpeg]]: Huffman + dequant + IDCT), the MP4/ISO-BMFF container box
  * tree, and the MPEG-1 Layer III frame-header walk — plus a pixel/
  * sample-level feature per payload, so the multimodal path demonstrates
  * actual byte-level media decoding end-to-end inside this container.
  * Only DSP payload decode (MP3 samples, H.264 frames) and non-baseline
  * image modes still fall back to [[MediaDecoder]]'s declared
  * deterministic stub; this object is the proof the swap-in seam carries
  * real decoders unchanged.
  *
  * All parsers are defensive the way the PDF stack is: bounds-checked
  * reads, malformed/truncated/unsupported payloads return None (an error
  * surface, never a throw — at 10^12 web documents every corruption WILL
  * occur), chunk walks skip unknown/ancillary blocks, PNG chunk CRCs are
  * verified, and decompressed sizes are capped up front so a crafted
  * payload cannot become a decompression bomb on an executor. */
object RealMedia {

  /** `feature`: BMP = sum of the blue channel over all pixels (row padding
    * excluded — a decoder that misreads the 4-byte row stride cannot
    * produce this sum); WAV = peak absolute sample amplitude; PNG = sum of
    * the green channel (wrong unfiltering in ANY of the five filter arms
    * corrupts it); GIF = sum of the palette red component over all pixels
    * (wrong LZW table growth / code width / KwKwK corrupts it). */
  final case class Decoded(container: String, width: Long, height: Long,
      sampleRate: Long, nSamples: Long, feature: Long)

  /** Decompression-bomb cap: max pixels per image (12 MB of RGB rows).
    * Payloads claiming more are rejected BEFORE any allocation. Shared
    * with [[Jpeg]] so the cap cannot drift between decoders. */
  private[multimodal] val MaxPixels = 1 << 22

  def decode(payload: Array[Byte]): Option[Decoded] =
    if (isBmp(payload)) decodeBmp(payload)
    else if (isWav(payload)) decodeWav(payload)
    else if (isPng(payload)) decodePng(payload)
    else if (isGif(payload)) decodeGif(payload)
    else if (isMp4(payload)) decodeMp4(payload)
    else if (Jpeg.isJpeg(payload)) Jpeg.decode(payload)
    else if (isMp3(payload)) decodeMp3(payload)
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

  // ------------------------------------------------------------------- PNG

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
      p(3) == 'G' && p(4) == 0x0d && p(5) == 0x0a && p(6) == 0x1a && p(7) == 0x0a

  private def beU32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)

  /** 8-bit truecolor (color type 2), non-interlaced PNG. The chunk walk
    * verifies every CRC, concatenates ALL IDAT chunks (encoders split zlib
    * streams arbitrarily), skips ancillary chunks (lowercase first letter)
    * and rejects unknown CRITICAL ones (per spec a decoder that cannot
    * interpret a critical chunk must not render). Unfiltering implements
    * all five PNG filters including the Paeth predictor. */
  private def decodePng(p: Array[Byte]): Option[Decoded] = {
    var off = 8
    var w = -1; var h = -1
    var seenEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    while (!seenEnd) {
      if (off + 12 > p.length) return None // shortest chunk is 12 bytes
      val len = beU32(p, off)
      if (len > Int.MaxValue - 12 || off + 12 + len > p.length) return None
      val body = off + 8
      crc.reset(); crc.update(p, off + 4, 4 + len.toInt)
      if ((crc.getValue & 0xffffffffL) != beU32(p, body + len.toInt)) return None
      val typ = new String(p, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (len != 13 || w >= 0) return None // exactly one, first
          w = beU32(p, body).toInt; h = beU32(p, body + 4).toInt
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          val bitDepth = p(body + 8) & 0xff; val colorType = p(body + 9) & 0xff
          val interlace = p(body + 12) & 0xff
          if (bitDepth != 8 || colorType != 2 || (p(body + 10) & 0xff) != 0 ||
            (p(body + 11) & 0xff) != 0 || interlace != 0) return None
        case "IDAT" =>
          if (w < 0) return None // IDAT before IHDR
          idat.write(p, body, len.toInt)
        case "IEND" => seenEnd = true
        case other =>
          if (w < 0) return None
          // ancillary = lowercase first letter; PLTE under color type 2 is
          // a legal suggested palette — skip. Any OTHER critical chunk is
          // uninterpretable → reject per spec.
          if ((other.charAt(0) & 0x20) == 0 && other != "PLTE") return None
      }
      off = body + len.toInt + 4
    }
    if (w < 0 || idat.size() == 0) return None
    val stride = w * 3
    val expected = h * (1 + stride)
    val raw = new Array[Byte](expected)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var total = 0
      var stalled = false
      while (total < expected && !inflater.finished() && !stalled) {
        val n = inflater.inflate(raw, total, expected - total)
        total += n
        if (n == 0 && !inflater.finished()) stalled = true // truncated / needs input
      }
      if (total != expected || stalled) return None
      if (!inflater.finished()) {
        // geometry is full but the stream continues: overflow unless the
        // only thing left is the zlib trailer
        val probe = new Array[Byte](1)
        if (inflater.inflate(probe) > 0 || !inflater.finished()) return None
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // unfilter in place, summing the green channel
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var greenSum = 0L
    var y = 0
    while (y < h) {
      val base = y * (1 + stride)
      val f = raw(base) & 0xff
      if (f > 4) return None
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xff
        val left = if (i >= 3) cur(i - 3) else 0
        val up = prev(i)
        val upLeft = if (i >= 3) prev(i - 3) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val pp = left + up - upLeft
            val pa = math.abs(pp - left); val pb = math.abs(pp - up)
            val pc = math.abs(pp - upLeft)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
        }
        cur(i) = (x + pred) & 0xff
        if (i % 3 == 1) greenSum += cur(i)
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some(Decoded("png", w, h, 0L, 0L, greenSum))
  }

  // ------------------------------------------------------------------- GIF

  private def isGif(p: Array[Byte]): Boolean =
    p.length >= 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  /** GIF87a/89a, single full-frame non-interlaced image over the global (or
    * a local) color table. Extension blocks (graphic control, comment,
    * application — any label) are skipped through their sub-block chains;
    * image data is decompressed by [[lzwDecode]]. */
  private def decodeGif(p: Array[Byte]): Option[Decoded] = {
    val w = u16(p, 6); val h = u16(p, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val flags = p(10) & 0xff
    var off = 13
    var palette: Array[Byte] = null
    var paletteSize = 0
    if ((flags & 0x80) != 0) {
      paletteSize = 2 << (flags & 7)
      if (off + paletteSize * 3 > p.length) return None
      palette = java.util.Arrays.copyOfRange(p, off, off + paletteSize * 3)
      off += paletteSize * 3
    }
    while (true) {
      if (off >= p.length) return None
      (p(off) & 0xff) match {
        case 0x21 => // extension: label byte, then sub-block chain
          off += 2
          var done = false
          while (!done) {
            if (off >= p.length) return None
            val n = p(off) & 0xff
            if (n == 0) { off += 1; done = true }
            else { off += 1 + n; if (off > p.length) return None }
          }
        case 0x2c => // image descriptor
          if (off + 10 > p.length) return None
          val left = u16(p, off + 1); val top = u16(p, off + 3)
          val iw = u16(p, off + 5); val ih = u16(p, off + 7)
          val iflags = p(off + 9) & 0xff
          // single full-frame only; interlace unsupported (extraction-tier
          // contract: reject, never misdecode)
          if (left != 0 || top != 0 || iw != w || ih != h) return None
          if ((iflags & 0x40) != 0) return None
          off += 10
          if ((iflags & 0x80) != 0) { // local color table overrides global
            paletteSize = 2 << (iflags & 7)
            if (off + paletteSize * 3 > p.length) return None
            palette = java.util.Arrays.copyOfRange(p, off, off + paletteSize * 3)
            off += paletteSize * 3
          }
          if (palette == null) return None
          if (off >= p.length) return None
          val minCodeSize = p(off) & 0xff
          off += 1
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (off >= p.length) return None
            val n = p(off) & 0xff
            if (n == 0) { off += 1; done = true }
            else {
              if (off + 1 + n > p.length) return None
              data.write(p, off + 1, n); off += 1 + n
            }
          }
          val indices = lzwDecode(data.toByteArray, minCodeSize, w * h)
            .getOrElse(return None)
          var sum = 0L
          var i = 0
          while (i < indices.length) {
            val idx = indices(i) & 0xff
            if (idx >= paletteSize) return None
            sum += (palette(idx * 3) & 0xff) // red component
            i += 1
          }
          return Some(Decoded("gif", w, h, 0L, 0L, sum))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None // unreachable
  }

  // ------------------------------------------------------------- MP4 (BMFF)

  private def isMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  private def beU64(p: Array[Byte], off: Int): Long =
    (beU32(p, off) << 32) | beU32(p, off + 4)

  /** One level of an ISO-BMFF box sequence as (type, bodyStart, bodyEnd).
    * Handles the 64-bit largesize form (size == 1) and the to-end-of-file
    * form (size == 0); any overrun/undersized box makes the WHOLE level
    * malformed (None) — web-crawled MP4s truncate mid-box constantly. */
  private def boxes(p: Array[Byte], start: Int, end: Int): Option[Seq[(String, Int, Int)]] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = start
    while (off < end) {
      if (off + 8 > end) return None
      var size = beU32(p, off)
      var hdr = 8
      if (size == 1) {
        if (off + 16 > end) return None
        size = beU64(p, off + 8)
        hdr = 16
      } else if (size == 0) size = (end - off).toLong // last box runs to EOF
      if (size < hdr || off + size > end) return None
      val typ = new String(p, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      out += ((typ, off + hdr, (off + size).toInt))
      off = (off + size).toInt
    }
    Some(out.result())
  }

  /** MP4/ISO-BMFF movie metadata — a REAL container parse (box walk with
    * both size forms, version-0/1 full boxes, handler-type track routing,
    * stts sample count), no codec needed: `width`/`height` from the video
    * track's tkhd (16.16 fixed point), `sampleRate` carries the mvhd
    * timescale, `nSamples` the video stts frame count, and `feature` the
    * movie duration in milliseconds. Audio-only or video-less movies
    * return None (the extraction tier routes them to the audio lane). */
  private def decodeMp4(p: Array[Byte]): Option[Decoded] = {
    val top = boxes(p, 0, p.length).getOrElse(return None)
    if (top.isEmpty || top.head._1 != "ftyp") return None
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    val mc = boxes(p, moov._2, moov._3).getOrElse(return None)
    // mvhd: movie timescale + duration (version 0 = 32-bit, 1 = 64-bit)
    val (timescale, duration) = mc.find(_._1 == "mvhd") match {
      case Some((_, b, e)) =>
        if (e - b < 4) return None
        (p(b) & 0xff) match {
          case 0 => if (e - b < 20) return None else (beU32(p, b + 12), beU32(p, b + 16))
          case 1 => if (e - b < 32) return None else (beU32(p, b + 20), beU64(p, b + 24))
          case _ => return None
        }
      case None => return None
    }
    // duration is multiplied by 1000 below; a version-1 (64-bit) value
    // past Long.MaxValue/1000 would overflow into a garbage (possibly
    // negative) duration returned as Some — reject it as malformed
    if (timescale <= 0 || duration < 0 || duration > Long.MaxValue / 1000)
      return None
    // first trak whose mdia/hdlr handler is 'vide'
    for ((typ, tb, te) <- mc if typ == "trak") {
      val tc = boxes(p, tb, te).getOrElse(return None)
      // a PRESENT but malformed mdia level rejects the whole file (the
      // boxes() contract) — folding it into "no mdia" would silently skip
      // this trak and let a corrupt file decode Some from another track
      val mdiaKids = tc.find(_._1 == "mdia") match {
        case Some((_, b, e)) => boxes(p, b, e).getOrElse(return None)
        case None            => Nil
      }
      val handler = mdiaKids.find(_._1 == "hdlr").map { case (_, b, e) =>
        if (e - b < 12) return None
        new String(p, b + 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
      }
      if (handler.contains("vide")) {
        val (w, h) = tc.find(_._1 == "tkhd") match {
          case Some((_, b, e)) =>
            if (e - b < 4) return None
            (p(b) & 0xff) match {
              case 0 => if (e - b < 84) return None
                else (beU32(p, b + 76) >> 16, beU32(p, b + 80) >> 16)
              case 1 => if (e - b < 96) return None
                else (beU32(p, b + 88) >> 16, beU32(p, b + 92) >> 16)
              case _ => return None
            }
          case None => return None
        }
        if (w <= 0 || h <= 0) return None
        // frame count: sum of stts sample_counts under mdia/minf/stbl
        var frames = 0L
        for {
          (_, mb, me) <- mdiaKids.find(_._1 == "minf")
          minfKids <- boxes(p, mb, me)
          (_, sb, se) <- minfKids.find(_._1 == "stbl")
          stblKids <- boxes(p, sb, se)
          (_, b, e) <- stblKids.find(_._1 == "stts")
        } {
          if (e - b < 8) return None
          val entries = beU32(p, b + 4)
          if (8 + entries * 8 > e - b) return None
          var i = 0
          while (i < entries) { frames += beU32(p, b + 8 + i * 8); i += 1 }
        }
        return Some(Decoded("mp4", w, h, timescale, frames,
          duration * 1000L / timescale))
      }
    }
    None // no video track
  }

  // ------------------------------------------------------------------- MP3

  private def isMp3(p: Array[Byte]): Boolean =
    p.length >= 4 && ((p(0) == 'I' && p(1) == 'D' && p(2) == '3') ||
      ((p(0) & 0xff) == 0xff && (p(1) & 0xe0) == 0xe0))

  private val Mp3Bitrates = // MPEG-1 Layer III, kbit/s (index 0 = free, 15 = bad)
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** MPEG-1 Layer III frame walk — REAL header parsing (sync word, version/
    * layer fields, bitrate + sample-rate tables, padding bit, frame-length
    * arithmetic) over an optional leading ID3v2 tag (SYNCSAFE size). No
    * DSP: `sampleRate` from the header tables, `nSamples` = frames × 1152,
    * `feature` = duration in ms. A header that desyncs, a reserved field,
    * free-format bitrate, mid-stream rate changes, or trailing garbage all
    * reject — at web scale a miscounted stream is worse than a skip.
    * MPEG-2/2.5 and Layers I/II route to the stub lane (None). */
  private def decodeMp3(p: Array[Byte]): Option[Decoded] = {
    var off = 0
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      // syncsafe 28-bit size; high bit set in any byte = malformed
      if (((p(6) | p(7) | p(8) | p(9)) & 0x80) != 0) return None
      val size = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
        ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
      off = 10 + size
      if (off >= p.length) return None
    }
    var frames = 0L
    var rate = -1
    while (off < p.length) {
      if (off + 4 > p.length) return None // truncated header
      if ((p(off) & 0xff) != 0xff || (p(off + 1) & 0xe0) != 0xe0) return None
      val versionBits = (p(off + 1) >> 3) & 3
      val layerBits = (p(off + 1) >> 1) & 3
      if (versionBits != 3 || layerBits != 1) return None // MPEG-1 Layer III only
      val brIdx = (p(off + 2) >> 4) & 0xf
      val srIdx = (p(off + 2) >> 2) & 3
      val padding = (p(off + 2) >> 1) & 1
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val sr = Mp3Rates(srIdx)
      if (rate < 0) rate = sr
      else if (rate != sr) return None // mid-stream rate change
      val len = 144 * Mp3Bitrates(brIdx) * 1000 / sr + padding
      if (len <= 4 || off + len > p.length) return None
      off += len
      frames += 1
    }
    if (frames == 0 || rate < 0) return None
    Some(Decoded("mp3", 0L, 0L, rate, frames * 1152L, frames * 1152L * 1000L / rate))
  }

  /** GIF-variant LZW: LSB-first variable-width codes starting at
    * minCodeSize+1 bits, clear/EOI codes, table growth to 4096 with the
    * standard decoder width-bump rule (bump when the just-added code is
    * 2^width − 1 — the decoder runs one entry behind the encoder), the
    * KwKwK case (code == next free slot), and deferred-clear tolerance
    * (full table stays at 12 bits until a clear arrives). Exactly
    * `expected` bytes must be produced before EOI; anything else is
    * malformed → None. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outLen = 0
    var codeSize = minCodeSize + 1
    var nextCode = eoi + 1
    var prev = -1
    var bitPos = 0L
    val totalBits = data.length.toLong * 8
    def firstOf(code: Int): Int = {
      var c = code
      while (c > eoi) c = prefix(c)
      c
    }
    while (true) {
      if (bitPos + codeSize > totalBits) return None // bits ran out before EOI
      val byteIdx = (bitPos >> 3).toInt
      val bitOff = (bitPos & 7).toInt
      var v = 0; var got = 0; var bi = byteIdx
      while (got < bitOff + codeSize) { v |= (data(bi) & 0xff) << got; got += 8; bi += 1 }
      val code = (v >> bitOff) & ((1 << codeSize) - 1)
      bitPos += codeSize
      if (code == clear) {
        nextCode = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return if (outLen == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code after clear must be a literal
        if (outLen >= expected) return None
        out(outLen) = code.toByte; outLen += 1
        prev = code
      } else {
        val isKwK = code == nextCode && nextCode < 4096
        if (!(code < clear || (code > eoi && code < nextCode) || isKwK)) return None
        val base = if (isKwK) prev else code
        val f = firstOf(base)
        // expand `base`'s string (suffix chain is last-to-first)
        var n = 0
        var c = base
        while (c > eoi) { stack(n) = suffix(c); n += 1; c = prefix(c) }
        stack(n) = c.toByte; n += 1
        val extra = if (isKwK) 1 else 0
        if (outLen + n + extra > expected) return None
        var i = n - 1
        while (i >= 0) { out(outLen) = stack(i); outLen += 1; i -= 1 }
        if (isKwK) { out(outLen) = f.toByte; outLen += 1 }
        if (nextCode < 4096) {
          prefix(nextCode) = prev; suffix(nextCode) = f.toByte
          if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
          nextCode += 1
        }
        prev = code // for KwKwK this IS the just-added entry's value
      }
    }
    None // unreachable
  }
}
