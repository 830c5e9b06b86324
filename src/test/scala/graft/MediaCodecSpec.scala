package graft

import graft.multimodal.{MediaDecoder, RealMedia}
import graft.pipeline.Corpus
import org.scalatest.funsuite.AnyFunSuite

/** Real PNG/GIF decoding (RealMedia): closed-form pixel sums independently
  * re-derived here, structural gates (multi-IDAT, ancillary-chunk skip, all
  * five PNG filters, GIF extension skip, LZW KwKwK / width growth / table
  * reset), a HAND-PACKED spec LZW stream (so the matched encoder/decoder
  * pair cannot silently agree on a wrong width rule), and executor-safety
  * fuzzing (mutations never throw). */
class MediaCodecSpec extends AnyFunSuite {

  private def pngGreenSum(id: Long): Long = {
    val w = 3 + (id % 5).toInt; val h = 5 + (id % 3).toInt
    (for { y <- 0 until h; x <- 0 until w } yield (x * 11 + y * 3 + 2 * id) % 256).sum
  }

  private def gifRedSum(id: Long): Long = {
    val w = 3 + (id % 5).toInt; val h = 5 + (id % 3).toInt
    (for { y <- 0 until h; x <- 0 until w }
      yield (((x * 5 + y * 7 + id) % 256) * 3 + id) % 256).sum
  }

  test("PNG: decode inverts deflate + all five filters for every geometry") {
    for (id <- 0L until 15L) { // 15 = lcm(5,3) geometry combinations
      val d = RealMedia.decode(Corpus.pngForDoc(id))
        .getOrElse(fail(s"id=$id: png did not decode"))
      assert(d.container == "png" && d.width == 3 + id % 5 && d.height == 5 + id % 3)
      assert(d.feature == pngGreenSum(id), s"id=$id green sum")
    }
  }

  test("PNG: generator emits the structures the decoder arms gate on") {
    val p = Corpus.pngForDoc(4L)
    def chunkTypes(bytes: Array[Byte]): Seq[String] = {
      var off = 8; val out = Seq.newBuilder[String]
      while (off + 12 <= bytes.length) {
        val len = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        out += new String(bytes, off + 4, 4, "US-ASCII")
        off += 12 + len
      }
      out.result()
    }
    val types = chunkTypes(p)
    assert(types.count(_ == "IDAT") == 2, "zlib stream must span two IDAT chunks")
    assert(types.contains("tEXt"), "ancillary chunk must be present to gate the skip")
    assert(types.head == "IHDR" && types.last == "IEND")
    // h >= 5 so filter types 0..4 all appear (filter byte = y % 5)
    assert((5L + 4L % 3) >= 5)
  }

  test("PNG: corruption and unsupported forms return None, never throw") {
    val good = Corpus.pngForDoc(6L)
    assert(RealMedia.decode(good).isDefined)
    // truncation at every 37th byte
    for (n <- 1 until good.length by 37)
      assert(RealMedia.decode(good.take(n)).isEmpty, s"truncated at $n")
    // flip one byte inside the first IDAT body -> CRC mismatch
    val idatOff = {
      var off = 8; var found = -1
      while (found < 0) {
        val len = ((good(off) & 0xff) << 24) | ((good(off + 1) & 0xff) << 16) |
          ((good(off + 2) & 0xff) << 8) | (good(off + 3) & 0xff)
        if (new String(good, off + 4, 4, "US-ASCII") == "IDAT") found = off + 8
        else off += 12 + len
      }
      found
    }
    val corrupt = good.clone(); corrupt(idatOff) = (corrupt(idatOff) ^ 0x41).toByte
    assert(RealMedia.decode(corrupt).isEmpty, "IDAT corruption must fail the CRC")
    // unknown CRITICAL chunk (uppercase first letter) -> reject per spec
    val crit = {
      val data = "x".getBytes("US-ASCII")
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put("CrIT".getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update("CrIT".getBytes("US-ASCII")); crc.update(data)
      b.putInt(crc.getValue.toInt)
      // splice after IHDR (8-byte sig + 25-byte IHDR chunk)
      good.take(33) ++ b.array() ++ good.drop(33)
    }
    assert(RealMedia.decode(crit).isEmpty, "unknown critical chunk must reject")
    // interlaced flag (patch IHDR byte + fix its CRC) -> unsupported
    val inter = good.clone()
    inter(8 + 8 + 12) = 1.toByte // interlace byte, last of IHDR data
    val crc = new java.util.zip.CRC32()
    crc.update(inter, 12, 4 + 13)
    val cv = crc.getValue
    inter(29) = ((cv >> 24) & 0xff).toByte; inter(30) = ((cv >> 16) & 0xff).toByte
    inter(31) = ((cv >> 8) & 0xff).toByte; inter(32) = (cv & 0xff).toByte
    assert(RealMedia.decode(inter).isEmpty, "interlace must be rejected, not misdecoded")
  }

  test("GIF: decode inverts real LZW for every geometry") {
    for (id <- 0L until 15L) {
      val d = RealMedia.decode(Corpus.gifForDoc(id))
        .getOrElse(fail(s"id=$id: gif did not decode"))
      assert(d.container == "gif" && d.width == 3 + id % 5 && d.height == 5 + id % 3)
      assert(d.feature == gifRedSum(id), s"id=$id palette-red sum")
    }
  }

  private def flatPalette(id: Long): Array[Byte] = {
    val pal = new Array[Byte](256 * 3)
    for (k <- 0 until 256) {
      pal(k * 3) = ((k * 3 + id) % 256).toByte
      pal(k * 3 + 1) = ((k * 5 + 2 * id) % 256).toByte
      pal(k * 3 + 2) = ((k * 7 + 3 * id) % 256).toByte
    }
    pal
  }

  test("GIF: uniform image forces the KwKwK arm") {
    // all-same indices make the encoder emit a code equal to the decoder's
    // next free slot on the second step (the classic KwKwK case)
    val bytes = Corpus.gifBytes(6, 5, Array.fill(30)(9.toByte), flatPalette(0L))
    val d = RealMedia.decode(bytes).getOrElse(fail("uniform gif did not decode"))
    assert(d.feature == 30L * ((9 * 3 + 0) % 256))
  }

  test("GIF: width growth past 9/10/11 bits (structured pattern)") {
    // 70x70 of a structured pattern: the dict crosses 512/1024 (code width
    // 9->10->11; it reaches ~2000 entries, NOT the 4096 cap — the dense
    // test below covers 12-bit codes and the reset)
    val w = 70; val h = 70
    val idx = Array.tabulate(w * h)(i => ((i * 37 + (i / 7) * 11 + 5) % 256).toByte)
    val bytes = Corpus.gifBytes(w, h, idx, flatPalette(3L))
    val d = RealMedia.decode(bytes).getOrElse(fail("large gif did not decode"))
    val expected = idx.map(b => ((b & 0xff) * 3 + 3L) % 256).sum
    assert(d.width == w && d.height == h && d.feature == expected)
  }

  test("GIF: 12-bit codes and the 4096 table reset (dense LCG stream)") {
    // LCG-random indices: almost every pixel pair is a new dict string, so
    // the table genuinely fills to 4096 and the encoder emits a mid-stream
    // CLEAR that the decoder's reset/deferred-clear arms must handle.
    val w = 80; val h = 80
    var s = 20260819L
    val idx = Array.tabulate(w * h) { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toByte
    }
    // independent greedy-LZW bookkeeping (mirrors the GIF encoder growth
    // rule) proves this INPUT really overflows the table — guards the test
    // itself against the 70x70 mistake above, where the claimed reset
    // never happened and the 12-bit arms shipped uncovered
    val dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = 258; var clears = 0; var prefix = idx(0) & 0xff
    for (j <- 1 until idx.length) {
      val b = idx(j) & 0xff
      dict.get((prefix, b)) match {
        case Some(c) => prefix = c
        case None =>
          dict((prefix, b)) = next; next += 1
          if (next > 4095) { dict.clear(); next = 258; clears += 1 }
          prefix = b
      }
    }
    assert(clears >= 1, s"stream must overflow the 4096 table (next=$next)")
    val bytes = Corpus.gifBytes(w, h, idx, flatPalette(3L))
    val d = RealMedia.decode(bytes).getOrElse(fail("dense gif did not decode"))
    val expected = idx.map(b => ((b & 0xff) * 3 + 3L) % 256).sum
    assert(d.width == w && d.height == h && d.feature == expected)
  }

  test("GIF: hand-packed spec stream pins code width + KwKwK independently") {
    // 5x1 image, all pixels index 5. Per the GIF spec the encoder output is
    // codes [clear=256, 5, 258 (KwKwK), 258, eoi=257] at 9 bits LSB-first.
    // Packed by hand here - NOT via Corpus.gifLzwEncode - so a matched-but-
    // wrong encoder/decoder pair cannot agree its way past this test.
    val codes = Seq(256, 5, 258, 258, 257)
    var bitBuf = 0L; var nBits = 0
    val packed = java.nio.ByteBuffer.allocate(8)
    codes.foreach { c =>
      bitBuf |= c.toLong << nBits; nBits += 9
      while (nBits >= 8) { packed.put((bitBuf & 0xff).toByte); bitBuf >>>= 8; nBits -= 8 }
    }
    if (nBits > 0) packed.put((bitBuf & 0xff).toByte)
    val lzw = java.util.Arrays.copyOf(packed.array(), packed.position())
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(5); out.write(0); out.write(1); out.write(0) // 5x1 LSD
    out.write(0xf7); out.write(0); out.write(0)
    out.write(flatPalette(7L))
    out.write(0x2c)
    out.write(Array[Byte](0, 0, 0, 0, 5, 0, 1, 0, 0)) // full-frame descriptor
    out.write(8) // min code size
    out.write(lzw.length); out.write(lzw); out.write(0)
    out.write(0x3b)
    val d = RealMedia.decode(out.toByteArray).getOrElse(fail("spec stream did not decode"))
    assert(d.width == 5 && d.height == 1)
    assert(d.feature == 5L * ((5 * 3 + 7) % 256))
  }

  test("GIF: malformed forms return None, never throw") {
    val good = Corpus.gifForDoc(3L)
    assert(RealMedia.decode(good).isDefined)
    for (n <- 1 until good.length by 29)
      assert(RealMedia.decode(good.take(n)).isEmpty, s"truncated at $n")
    // interlace flag on the image descriptor -> unsupported
    val imgOff = good.indexOfSlice(Array[Byte](0x2c, 0, 0, 0, 0))
    assert(imgOff > 0)
    val inter = good.clone(); inter(imgOff + 9) = 0x40.toByte
    assert(RealMedia.decode(inter).isEmpty)
    // garbage LZW body: replace the first data sub-block's bytes with 0xFF
    val lzwBody = good.clone()
    val dataStart = imgOff + 10 + 1 // descriptor + min-code-size byte
    val blockLen = lzwBody(dataStart) & 0xff
    for (i <- 0 until blockLen) lzwBody(dataStart + 1 + i) = 0xff.toByte
    assert(RealMedia.decode(lzwBody).isEmpty, "corrupt LZW must reject")
    // trailer with no image
    val noImage = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 2, 0, 0, 0, 0, 0x3b)
    assert(RealMedia.decode(noImage).isEmpty)
  }

  test("MediaDecoder front routes PNG/GIF as real image dimensions") {
    val (pw, ph, pf, psr) = MediaDecoder.decode("image", Corpus.pngForDoc(8L))
    assert((pw, ph, pf, psr) == (3L + 8 % 5, 5L + 8 % 3, 1L, 0L))
    val (gw, gh, gf, gsr) = MediaDecoder.decode("image", Corpus.gifForDoc(9L))
    assert((gw, gh, gf, gsr) == (3L + 9 % 5, 5L + 9 % 3, 1L, 0L))
  }

  test("MP4: box walk, decoy-audio-track routing, 64-bit mdat, stts frames") {
    for (id <- 0L until 24L) {
      val d = RealMedia.decode(Corpus.mp4ForDoc(id))
        .getOrElse(fail(s"id=$id: mp4 did not decode"))
      assert(d.container == "mp4")
      assert(d.width == 160 + 16 * (id % 8) && d.height == 96 + 16 * (id % 5))
      assert(d.sampleRate == 1000 * (1 + id % 3), "timescale")
      assert(d.nSamples == 1 + id % 24,
        "frame count must come from the VIDEO track's stts, not the decoy audio")
      assert(d.feature == (4000 + id * 7 % 9000) / (1 + id % 3), "duration ms")
    }
    val (w, h, frames, sr) = MediaDecoder.decode("video", Corpus.mp4ForDoc(11L))
    assert((w, h, frames, sr) == (160L + 16 * 3, 96L + 16 * 1, 12L, 0L))
  }

  test("MP4: malformed box trees return None, never throw") {
    val good = Corpus.mp4ForDoc(2L)
    assert(RealMedia.decode(good).isDefined)
    for (n <- 9 until good.length by 23)
      assert(RealMedia.decode(good.take(n)).isEmpty, s"truncated at $n")
    // oversized child box size -> whole level malformed
    val bad = good.clone()
    val moovOff = {
      var off = 0; var found = -1
      while (found < 0) {
        val size = ((bad(off) & 0xff) << 24) | ((bad(off + 1) & 0xff) << 16) |
          ((bad(off + 2) & 0xff) << 8) | (bad(off + 3) & 0xff)
        if (new String(bad, off + 4, 4, "US-ASCII") == "moov") found = off
        else off += size
      }
      found
    }
    bad(moovOff + 8) = 0x7f.toByte // first child (mvhd) size explodes
    assert(RealMedia.decode(bad).isEmpty)
    // a malformed mdia INSIDE the decoy audio trak must reject the whole
    // file — treating it as "no mdia" would skip the trak and still decode
    // Some from the healthy video trak (a corrupt file decoding confidently)
    val badMdia = good.clone()
    val mdiaOff = {
      var i = 0; var found = -1
      while (found < 0) {
        if (badMdia(i) == 'm' && badMdia(i + 1) == 'd' &&
          badMdia(i + 2) == 'i' && badMdia(i + 3) == 'a') found = i
        else i += 1
      }
      found // first occurrence = the audio trak's mdia type tag
    }
    badMdia(mdiaOff + 4) = 0x7f.toByte // first child (mdhd) size explodes
    assert(RealMedia.decode(badMdia).isEmpty,
      "malformed mdia level inside any trak rejects the file")
    // audio-only movie (no vide handler) -> None, routed to the stub
    val audioOnly = {
      val src = Corpus.mp4ForDoc(2L)
      val out = src.clone()
      var i = 0
      while (i < out.length - 4) { // flip every 'vide' handler to 'soun'
        if (out(i) == 'v' && out(i + 1) == 'i' && out(i + 2) == 'd' && out(i + 3) == 'e') {
          out(i) = 's'; out(i + 1) = 'o'; out(i + 2) = 'u'; out(i + 3) = 'n'
        }
        i += 1
      }
      out
    }
    assert(RealMedia.decode(audioOnly).isEmpty)
  }

  test("JPEG: full Huffman+dequant+IDCT pipeline lands on the closed form") {
    for (id <- 0L until 6L) { // all (bw, bh) geometry combinations
      val d = RealMedia.decode(Corpus.jpegForDoc(id))
        .getOrElse(fail(s"id=$id: jpeg did not decode"))
      assert(d.container == "jpeg")
      val bw = 2 + (id % 3).toInt; val bh = 1 + (id % 2).toInt
      assert(d.width == 8 * bw && d.height == 8 * bh)
      val expected = (for { by <- 0 until bh; bx <- 0 until bw }
        yield 64L * ((bx * 29 + by * 31 + id) % 256)).sum
      assert(d.feature == expected, s"id=$id luma sum")
    }
    val (w, h, f, sr) = MediaDecoder.decode("image", Corpus.jpegForDoc(4L))
    assert((w, h, f, sr) == (24L, 8L, 1L, 0L))
  }

  test("JPEG: 0xFF00 byte stuffing in the scan is produced and unstuffed") {
    // Only a +255 DC delta (8 one-bits) can form 0xFF: every block ends in
    // the EOB code 000, so one-runs never span blocks. Alignment: block 1
    // (diff -128, 17 bits) + five diff-0 blocks (5 bits each) = 42 bits
    // = 2 (mod 8); the next block's s=8 code (6 bits) then ends on a byte
    // boundary and its 11111111 diff bits fill a whole stuffed 0xFF.
    val vals = Array(0, 0, 0, 0, 0, 0, 255, 255)
    val bytes = Corpus.jpegBytes(64, 8, (bx, _) => vals(bx))
    val scanStart = {
      var i = 2; var s = -1
      while (s < 0) {
        assert((bytes(i) & 0xff) == 0xff)
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if ((bytes(i + 1) & 0xff) == 0xda) s = i + 2 + len else i += 2 + len
      }
      s
    }
    val scan = bytes.slice(scanStart, bytes.length - 2)
    assert(scan.sliding(2).exists(s => (s(0) & 0xff) == 0xff && s(1) == 0),
      "fixture must exercise the stuffing arm")
    val d = RealMedia.decode(bytes).getOrElse(fail("stuffed jpeg did not decode"))
    assert(d.feature == vals.map(64L * _).sum, "unstuffed decode sum")
  }

  test("JPEG: AC coefficients decode against an independent reference IDCT") {
    // Hand-built 8x8 single-block stream with real AC coefficients, packed
    // by an inline encoder independent of Corpus.jpegBytes. Scan symbols:
    // DC s=2 diff=+2, AC (0,1)+1, (1,1)-1, ZRL, (2,1)+1, EOB.
    def canonical(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0; var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) { m += vals(k) -> ((code, l)); code += 1; k += 1 }
        code <<= 1
      }
      m.result()
    }
    val dcC = canonical(Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
    val acC = canonical(Array(0, 0, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0x00, 0x01, 0x11, 0x21, 0xf0))
    val out = new java.io.ByteArrayOutputStream()
    def seg(m: Int, body: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    out.write(0xff); out.write(0xd8)
    val qtNat = Array.tabulate(64)(i => if (i == 0) 8 else 16)
    seg(0xdb, 0.toByte +: Array.tabulate(64)(i =>
      qtNat(graft.multimodal.Jpeg.Zigzag(i)).toByte))
    seg(0xc0, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(0xc4, 0x00.toByte +:
      (Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0).map(_.toByte) ++
        Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11).map(_.toByte)))
    seg(0xc4, 0x10.toByte +:
      (Array(0, 0, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte) ++
        Array(0x00, 0x01, 0x11, 0x21, 0xf0).map(_.toByte)))
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    var acc = 0L; var n = 0
    def put(v: Int, len: Int): Unit = {
      acc = (acc << len) | (v & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val b = ((acc >> (n - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0); n -= 8
      }
    }
    def putCode(c: (Int, Int)): Unit = put(c._1, c._2)
    putCode(dcC(2)); put(2, 2) // DC diff +2 -> coef[0] = 2*8 = 16
    putCode(acC(0x01)); put(1, 1) // k=1: zigzag 1 -> nat 1, +16
    putCode(acC(0x11)); put(0, 1) // run 1 -> k=3: zigzag 3 -> nat 16, -16
    putCode(acC(0xf0)) // ZRL -> k=20
    putCode(acC(0x21)); put(1, 1) // run 2 -> k=22: zigzag 22 -> nat 41, +16
    putCode(acC(0x00)) // EOB
    if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
    out.write(0xff); out.write(0xd9)
    val d = RealMedia.decode(out.toByteArray).getOrElse(fail("AC jpeg did not decode"))
    // independent reference: coefficients in natural order, double IDCT
    val coef = new Array[Int](64)
    coef(0) = 16; coef(1) = 16; coef(16) = -16; coef(41) = 16
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    var refSum = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c(u) * c(v) * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val p = math.round(s / 4.0 + 128.0).toInt
      refSum += math.max(0, math.min(255, p))
    }
    assert(d.width == 8 && d.height == 8 && d.feature == refSum)
  }

  test("JPEG: non-baseline and malformed forms return None, never throw") {
    val good = Corpus.jpegForDoc(1L)
    assert(RealMedia.decode(good).isDefined)
    for (n <- 3 until good.length by 19)
      assert(RealMedia.decode(good.take(n)).isEmpty, s"truncated at $n")
    // progressive: flip SOF0 -> SOF2
    val prog = good.clone()
    val sofOff = {
      var i = 2; var found = -1
      while (found < 0) {
        if ((prog(i + 1) & 0xff) == 0xc0) found = i + 1
        else i += 2 + (((prog(i + 2) & 0xff) << 8) | (prog(i + 3) & 0xff))
      }
      found
    }
    prog(sofOff) = 0xc2.toByte
    assert(RealMedia.decode(prog).isEmpty, "progressive must be rejected")
    // multi-component (color) frame header
    val color = good.clone(); color(sofOff + 8) = 3.toByte
    assert(RealMedia.decode(color).isEmpty, "color must route to the stub lane")
  }

  test("JPEG: overrunning zero-runs and leftover entropy data reject") {
    // (a) ZRL runs that overrun the 64-coefficient block: DC s=0 then four
    // ZRLs drive k to 65 with no EOB ever consumed. Hand-assembled minimal
    // stream — without the ZRL bounds check this "decoded" to a confident
    // DC-only block instead of rejecting.
    val out = new java.io.ByteArrayOutputStream()
    def seg(m: Int, body: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(body, 0, body.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xdb, (0 +: Seq.fill(64)(8)).map(_.toByte).toArray) // DQT id 0
    // DHT DC id 0: one 1-bit code -> s=0
    seg(0xc4, (Seq(0x00, 1) ++ Seq.fill(15)(0) ++ Seq(0x00)).map(_.toByte).toArray)
    // DHT AC id 0: two 2-bit codes -> '00'=EOB, '01'=ZRL
    seg(0xc4, (Seq(0x10, 0, 2) ++ Seq.fill(14)(0) ++ Seq(0x00, 0xf0)).map(_.toByte).toArray)
    seg(0xc0, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0)) // SOF0 8x8 grayscale
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS
    // entropy bits MSB-first: DC '0', then ZRL '01' x4 = "001010101" ->
    // 0x2A + padded 0xFF (stuffed as FF 00), then EOI
    out.write(0x2a); out.write(0xff); out.write(0x00)
    out.write(0xff); out.write(0xd9)
    assert(RealMedia.decode(out.toByteArray).isEmpty,
      "a scan whose zero-runs overrun the block must reject, not misdecode")
    // (b) corrupt SOF height (16 -> 8) on a real two-block-row fixture: the
    // decoder now consumes only half the entropy-coded blocks, and the
    // leftover coded data must reject — an anywhere-in-the-tail EOI search
    // would skip it and return a confident half-image.
    val half = Corpus.jpegForDoc(1L).clone()
    val sofOff = {
      var i = 2; var found = -1
      while (found < 0) {
        if ((half(i + 1) & 0xff) == 0xc0) found = i + 1
        else i += 2 + (((half(i + 2) & 0xff) << 8) | (half(i + 3) & 0xff))
      }
      found
    }
    assert(((half(sofOff + 4) & 0xff) << 8 | (half(sofOff + 5) & 0xff)) == 16)
    half(sofOff + 5) = 8.toByte
    assert(RealMedia.decode(half).isEmpty,
      "leftover entropy-coded blocks after the last decoded block must reject")
  }

  test("MP3: syncsafe ID3 skip, frame-length walk, padding bit, duration") {
    for (id <- 0L until 42L) { // covers all (frames%30, rate%3, bitrate%14) arms
      val d = RealMedia.decode(Corpus.mp3ForDoc(id))
        .getOrElse(fail(s"id=$id: mp3 did not decode"))
      val frames = 20 + id % 30
      val rate = Array(44100L, 48000L, 32000L)((id % 3).toInt)
      assert(d.container == "mp3" && d.sampleRate == rate)
      assert(d.nSamples == frames * 1152, "frame count via length walk")
      assert(d.feature == frames * 1152 * 1000 / rate, "duration ms")
    }
    val (w, h, f, sr) = MediaDecoder.decode("audio", Corpus.mp3ForDoc(10L))
    assert((w, h, f, sr) == (0L, 0L, 0L, 48000L))
  }

  test("MP3: desync, reserved fields and truncation return None") {
    val good = Corpus.mp3ForDoc(4L)
    assert(RealMedia.decode(good).isDefined)
    // truncating mid-frame breaks the final length check
    assert(RealMedia.decode(good.dropRight(1)).isEmpty)
    assert(RealMedia.decode(good.take(12)).isEmpty)
    // non-syncsafe ID3 size (high bit set) -> malformed
    val badTag = good.clone(); badTag(6) = 0x80.toByte
    assert(RealMedia.decode(badTag).isEmpty)
    // find the first frame header (after the ID3 tag) and corrupt fields
    val firstFrame = {
      val size = ((good(6) & 0x7f) << 21) | ((good(7) & 0x7f) << 14) |
        ((good(8) & 0x7f) << 7) | (good(9) & 0x7f)
      10 + size
    }
    assert((good(firstFrame) & 0xff) == 0xff)
    val layer2 = good.clone(); layer2(firstFrame + 1) = 0xfd.toByte // Layer II
    assert(RealMedia.decode(layer2).isEmpty, "non-Layer-III must route to the stub")
    val freeBr = good.clone() // free-format bitrate (index 0)
    freeBr(firstFrame + 2) = (freeBr(firstFrame + 2) & 0x0f).toByte
    assert(RealMedia.decode(freeBr).isEmpty)
    // flipping one frame's padding bit desyncs the walk -> None, never a
    // wrong frame count
    val desync = good.clone()
    desync(firstFrame + 2) = (desync(firstFrame + 2) ^ 0x02).toByte
    assert(RealMedia.decode(desync).isEmpty)
  }

  test("fuzz: mutated PNG/GIF payloads never throw (executor safety)") {
    val rng = new scala.util.Random(20260819L)
    val bases = Seq(Corpus.pngForDoc(2L), Corpus.gifForDoc(5L),
      Corpus.mp4ForDoc(7L), Corpus.jpegForDoc(3L), Corpus.mp3ForDoc(6L))
    var rejected = 0
    for (base <- bases; _ <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 to rng.nextInt(3))
        m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      val r = RealMedia.decode(m) // must not throw
      if (r.isEmpty) rejected += 1
    }
    assert(rejected > 0, "fuzz too weak - no mutation was ever rejected")
  }
}
