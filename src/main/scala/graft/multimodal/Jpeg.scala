package graft.multimodal

/** REAL baseline JPEG decoder (grayscale / single-component), no codec
  * library: marker segment walk, DQT (zigzag) dequantization tables, DHT
  * canonical Huffman construction from arbitrary BITS/HUFFVAL, SOF0
  * frame header, MSB-first entropy decoding with 0xFF00 byte unstuffing,
  * DC prediction + magnitude-category extension, AC run/size decoding
  * (EOB and ZRL included), and a double-precision separable IDCT with
  * level shift and clamping. Block overhang at non-multiple-of-8 sizes is
  * clipped per spec.
  *
  * Deliberately OUT of scope (→ None, never a wrong decode): progressive
  * (SOF2) and the other non-baseline frame types, multi-component scans
  * (color), 16-bit quant tables, restart intervals. At the extraction tier
  * those route to the declared stub lane; a wrong pixel is worse than a
  * declared skip at 10^12 documents.
  *
  * The [[graft.pipeline.Corpus.jpegForDoc]] fixtures are per-block-constant
  * images: constant blocks round-trip BIT-EXACTLY through DCT → quant →
  * IDCT (only the DC coefficient is nonzero and q[0]=8 makes the coded DC
  * exactly v−128), so the DuckDB oracle can recompute the decoded luma sum
  * in closed form while this decoder still has to run the full entropy +
  * IDCT pipeline to produce it. AC coefficient paths are pinned by unit
  * tests against an independent reference IDCT (MediaCodecSpec). */
object Jpeg {

  def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff

  /** Natural-order index for each zigzag position. */
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64) // t(u*8+x) = C(u)·cos((2x+1)uπ/16)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        t(u * 8 + x) = c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Canonical Huffman decode table per Annex C/F: per-length min/max code
    * plus a value pointer into huffval. */
  private final class HuffTable(bits: Array[Int], val huffval: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1 // no codes at this length
        code <<= 1
        l += 1
      }
    }
  }

  /** MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    * any other 0xFF-marker inside the scan is malformed for our
    * restart-free scans. Returns -1 on exhaustion/malformed. */
  private final class BitReader(p: Array[Byte], var pos: Int, end: Int) {
    private var acc = 0
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= end) return -1
        val b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= end) return -1
          val m = p(pos) & 0xff
          if (m != 0x00) return -1 // RST/other marker mid-scan: unsupported
          pos += 1
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { val b = bit(); if (b < 0) return -1; v = (v << 1) | b; i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        val b = bit(); if (b < 0) return -1
        code = (code << 1) | b
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.huffval(t.valPtr(l) + code - t.minCode(l))
        l += 1
      }
      -1
    }
  }

  /** Magnitude-category extension (F.2.2.1 EXTEND). */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u16be(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)

  def decode(p: Array[Byte]): Option[RealMedia.Decoded] = {
    if (!isJpeg(p)) return None
    var off = 2
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = -1; var h = -1; var qId = -1
    var scanDc = -1; var scanAc = -1
    var scanStart = -1
    // ---- marker segment walk up to SOS
    while (scanStart < 0) {
      if (off + 2 > p.length) return None
      if ((p(off) & 0xff) != 0xff) return None
      var marker = p(off + 1) & 0xff
      off += 2
      while (marker == 0xff) { // fill bytes before a marker are legal
        if (off >= p.length) return None
        marker = p(off) & 0xff; off += 1
      }
      marker match {
        case 0xd8 => // stray SOI
        case 0xd9 => return None // EOI before any scan
        case m if m >= 0xd0 && m <= 0xd7 => return None // RST outside scan
        case 0xc0 => // SOF0 baseline
          if (off + 2 > p.length) return None
          val len = u16be(p, off)
          if (off + len > p.length || len < 8) return None
          val b = off + 2
          if ((p(b) & 0xff) != 8) return None // precision
          h = u16be(p, b + 1); w = u16be(p, b + 3)
          val nComp = p(b + 5) & 0xff
          if (nComp != 1) return None // grayscale tier only
          if (len < 8 + 3 * nComp) return None
          if ((p(b + 7) & 0xff) != 0x11) return None // 1x1 sampling
          qId = p(b + 8) & 0xff
          if (w <= 0 || h <= 0 || qId > 3 ||
            w.toLong * h > RealMedia.MaxPixels) return None
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) ||
          (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
          return None // non-baseline-sequential frame types
        case 0xdb => // DQT (possibly several tables per segment)
          if (off + 2 > p.length) return None
          val len = u16be(p, off)
          if (off + len > p.length) return None
          var q = off + 2
          while (q < off + len) {
            val pqTq = p(q) & 0xff
            if ((pqTq >> 4) != 0) return None // 16-bit tables unsupported
            val id = pqTq & 0x0f
            if (id > 3 || q + 65 > off + len) return None
            val tbl = new Array[Int](64)
            var i = 0
            while (i < 64) { tbl(Zigzag(i)) = p(q + 1 + i) & 0xff; i += 1 }
            quant(id) = tbl
            q += 65
          }
        case 0xc4 => // DHT (possibly several tables per segment)
          if (off + 2 > p.length) return None
          val len = u16be(p, off)
          if (off + len > p.length) return None
          var q = off + 2
          while (q < off + len) {
            val tcTh = p(q) & 0xff
            val cls = tcTh >> 4; val id = tcTh & 0x0f
            if (cls > 1 || id > 3 || q + 17 > off + len) return None
            val bits = Array.tabulate(16)(i => p(q + 1 + i) & 0xff)
            val n = bits.sum
            if (n == 0 || n > 256 || q + 17 + n > off + len) return None
            val vals = Array.tabulate(n)(i => p(q + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTables(id) = t else acTables(id) = t
            q += 17 + n
          }
        case 0xdd => return None // DRI/restart intervals unsupported
        case 0xda => // SOS
          if (off + 2 > p.length) return None
          val len = u16be(p, off)
          if (off + len > p.length || len < 8) return None
          val b = off + 2
          if ((p(b) & 0xff) != 1) return None // single-component scan only
          val tdTa = p(b + 2) & 0xff
          scanDc = tdTa >> 4; scanAc = tdTa & 0x0f
          if (scanDc > 3 || scanAc > 3) return None
          if ((p(b + 3) & 0xff) != 0 || (p(b + 4) & 0xff) != 63 ||
            (p(b + 5) & 0xff) != 0) return None // sequential full-spectrum
          scanStart = off + len
        case _ => // APPn, COM, and other skippable segments
          if (off + 2 > p.length) return None
          val len = u16be(p, off)
          if (len < 2 || off + len > p.length) return None
      }
      if (scanStart < 0 && marker != 0xd8)
        off += u16be(p, off)
    }
    if (w < 0 || quant(qId) == null || dcTables(scanDc) == null ||
      acTables(scanAc) == null) return None
    val qt = quant(qId)
    val dcT = dcTables(scanDc)
    val acT = acTables(scanAc)
    // ---- entropy decode + IDCT, clipping overhang, summing luma
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    val r = new BitReader(p, scanStart, p.length)
    var pred = 0
    var lumaSum = 0L
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(coef, 0)
        val s = r.decode(dcT)
        if (s < 0 || s > 11) return None
        val diffBits = if (s == 0) 0 else { val v = r.bits(s); if (v < 0) return None; v }
        pred += extend(diffBits, s)
        coef(0) = pred * qt(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = r.decode(acT)
          if (rs < 0) return None
          if (rs == 0x00) eob = true
          else if (rs == 0xf0) {
            // ZRL: 16 zero coefficients, which must FIT and leave room for
            // the coefficient that follows (trailing zeros are coded as
            // EOB, never ZRL) — without this check a malformed scan whose
            // zero-runs overrun the block exits the loop with no EOB
            // consumed and misdecodes instead of rejecting
            k += 16
            if (k > 63) return None
          }
          else {
            k += rs >> 4
            val sz = rs & 0x0f
            if (k > 63 || sz == 0) return None
            val v = r.bits(sz)
            if (v < 0) return None
            val nat = Zigzag(k)
            coef(nat) = extend(v, sz) * qt(nat)
            k += 1
          }
        }
        idct(coef, pix)
        val xMax = math.min(8, w - bx * 8); val yMax = math.min(8, h - by * 8)
        var y = 0
        while (y < yMax) {
          var x = 0
          while (x < xMax) { lumaSum += pix(y * 8 + x); x += 1 }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    // the scan must terminate at EOI IMMEDIATELY after the last decoded
    // block (byte-aligned past padding bits; optional 0xFF fill bytes are
    // legal before a marker). Scanning forward for FF D9 anywhere would
    // accept unlimited leftover entropy data — e.g. a corrupt SOF height
    // that halves the block count would "decode" half the image and skip
    // the rest, a confident wrong answer instead of a reject. Bytes after
    // EOI are ignored (trailing junk is common in the wild and cannot
    // change decoded pixels).
    var e = r.pos
    while (e + 1 < p.length && (p(e) & 0xff) == 0xff && (p(e + 1) & 0xff) == 0xff)
      e += 1
    if (e + 1 >= p.length || (p(e) & 0xff) != 0xff || (p(e + 1) & 0xff) != 0xd9)
      return None
    Some(RealMedia.Decoded("jpeg", w, h, 0L, 0L, lumaSum))
  }

  /** Separable 2-D inverse DCT (double precision), level shift + clamp —
    * bit-exact on DC-only blocks, reference-accurate elsewhere. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: 1-D IDCT over u for each row of coefficients
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTable(u * 8 + x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns: 1-D IDCT over v
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTable(v * 8 + yy) * tmp(v * 8 + x); v += 1 }
        val p = math.round(s / 4.0 + 128.0).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }
}
