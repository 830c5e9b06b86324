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

  test("GIF: width growth past 9/10/11 bits and the 4096 table reset") {
    // 70x70 of a non-repeating pattern: the dict crosses 512/1024/2048
    // (code width 9->10->11->12) and fills to 4096, forcing an encoder
    // clear + decoder reset mid-stream
    val w = 70; val h = 70
    val idx = Array.tabulate(w * h)(i => ((i * 37 + (i / 7) * 11 + 5) % 256).toByte)
    val bytes = Corpus.gifBytes(w, h, idx, flatPalette(3L))
    val d = RealMedia.decode(bytes).getOrElse(fail("large gif did not decode"))
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

  test("fuzz: mutated PNG/GIF payloads never throw (executor safety)") {
    val rng = new scala.util.Random(20260819L)
    val bases = Seq(Corpus.pngForDoc(2L), Corpus.gifForDoc(5L))
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
