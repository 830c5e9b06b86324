package graft.pdf

import java.io.ByteArrayOutputStream

/** Capability extension beyond the reference: LZWDecode, ASCIIHexDecode and
  * ASCII85Decode stream filters (ISO 32000-1 §7.4.2-7.4.4). The reference
  * throws `NotSupportedException` on anything but None/FlateDecode
  * (Token.cs:631-647); our default mode replicates that (error row), and
  * `extendedFilters = true` opts into these decoders for real-web corpora.
  * Pure functions — no shared state, safe inside mapPartitions. */
object ExtraFilters {

  // ------------------------------------------------------------ LZWDecode

  /** PDF LZW: MSB-first variable-width codes (9→12 bits), 256=clear,
    * 257=EOD, `earlyChange` widens one code early (default 1). */
  def lzwDecode(data: Array[Byte], off: Int, len: Int, earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream(len * 3)
    val table = new Array[Array[Byte]](4096)
    var tableSize = 0
    def resetTable(): Unit = {
      tableSize = 258
      var i = 0
      while (i < 256) { table(i) = Array(i.toByte); i += 1 }
    }
    resetTable()
    var width = 9
    var prev: Array[Byte] = null
    var acc = 0L
    var accBits = 0
    var i = off
    val end = off + len
    var done = false
    while (!done) {
      while (accBits < width && i < end) {
        acc = (acc << 8) | (data(i) & 0xff); accBits += 8; i += 1
      }
      if (accBits < width) done = true // ran out without EOD: tolerate
      else {
        val code = ((acc >>> (accBits - width)) & ((1 << width) - 1)).toInt
        accBits -= width
        if (code == 256) {
          resetTable(); width = 9; prev = null
        } else if (code == 257) {
          done = true
        } else {
          val entry: Array[Byte] =
            if (code < tableSize && table(code) != null) table(code)
            else if (code == tableSize && prev != null) prev :+ prev(0)
            else throw new IllegalArgumentException(s"LZW: invalid code $code (table $tableSize)")
          out.write(entry, 0, entry.length)
          if (prev != null && tableSize < 4096) {
            table(tableSize) = prev :+ entry(0)
            tableSize += 1
          }
          prev = entry
          // Standard early-change schedule (ISO 32000-1 §7.4.4 / TIFF 6):
          // with earlyChange=1 the 9→10 switch happens as soon as table
          // entry 511 exists (decoder tableSize = 511), NOT 510 — the
          // decoder's table lags the encoder's by one entry and the
          // conditions here and in [[lzwEncode]] account for that lag.
          // Verified against a schedule-derived independent encoder in
          // ExtraFiltersSpec ("LZW width schedule matches the spec").
          if (tableSize + earlyChange >= (1 << width) && width < 12) width += 1
        }
      }
    }
    out.toByteArray
  }

  /** LZW encoder (fixtures/round-trip tests; always emits clear first and
    * EOD last, earlyChange=1 to mirror the decoder default). */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length)
    var acc = 0L
    var accBits = 0
    var width = 9
    val dict = new java.util.HashMap[java.util.List[java.lang.Byte], Integer]()
    var nextCode = 258
    def emit(code: Int): Unit = {
      acc = (acc << width) | code; accBits += width
      while (accBits >= 8) { out.write(((acc >>> (accBits - 8)) & 0xff).toInt); accBits -= 8 }
    }
    emit(256) // clear
    var cur = new java.util.ArrayList[java.lang.Byte]()
    def codeOf(s: java.util.List[java.lang.Byte]): Int =
      if (s.size == 1) s.get(0) & 0xff else dict.get(s)
    var i = 0
    while (i < data.length) {
      val b: java.lang.Byte = data(i)
      val cand = new java.util.ArrayList[java.lang.Byte](cur); cand.add(b)
      val known = cand.size == 1 || dict.containsKey(cand)
      if (known) cur = cand
      else {
        emit(codeOf(cur))
        if (nextCode < 4096) {
          dict.put(cand, nextCode); nextCode += 1
          // mirror of the decoder's early-change point: the code emitted
          // after entry (2^w - earlyChange) is added uses w+1 bits
          if (nextCode - 1 >= (1 << width) - 1 && width < 12) width += 1
        }
        cur = new java.util.ArrayList[java.lang.Byte](); cur.add(b)
      }
      i += 1
    }
    if (!cur.isEmpty) emit(codeOf(cur))
    emit(257) // EOD
    if (accBits > 0) out.write(((acc << (8 - accBits)) & 0xff).toInt)
    out.toByteArray
  }

  // -------------------------------------------------------- ASCIIHexDecode

  def asciiHexDecode(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(len / 2)
    var hi = -1
    var i = off
    val end = off + len
    var done = false
    while (i < end && !done) {
      val c = data(i) & 0xff
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c == '>') { done = true; -1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0) -1
        else throw new IllegalArgumentException(s"ASCIIHex: invalid byte $c")
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit: low nibble 0
    out.toByteArray
  }

  def asciiHexEncode(data: Array[Byte]): Array[Byte] =
    (data.map(b => f"${b & 0xff}%02x").mkString + ">").getBytes("ISO-8859-1")

  // -------------------------------------------------------- ASCII85Decode

  def ascii85Decode(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(len * 4 / 5)
    var tuple = 0L
    var count = 0
    var i = off
    val end = off + len
    var done = false
    while (i < end && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && count == 0) out.write(Array[Byte](0, 0, 0, 0))
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) {
          out.write(((tuple >> 24) & 0xff).toInt); out.write(((tuple >> 16) & 0xff).toInt)
          out.write(((tuple >> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; count = 0
        }
      } else if (c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0) ()
      else throw new IllegalArgumentException(s"ASCII85: invalid byte $c")
      i += 1
    }
    if (count > 0) {
      // partial group: pad with 'u' (84), emit count-1 bytes
      var k = count
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      val bytes = Array(((tuple >> 24) & 0xff).toByte, ((tuple >> 16) & 0xff).toByte,
        ((tuple >> 8) & 0xff).toByte, (tuple & 0xff).toByte)
      out.write(bytes, 0, count - 1)
    }
    out.toByteArray
  }

  def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var tuple = 0L
      var k = 0
      while (k < 4) { tuple = (tuple << 8) | (if (k < n) data(i + k) & 0xff else 0); k += 1 }
      if (n == 4 && tuple == 0) sb.append('z')
      else {
        val chars = new Array[Char](5)
        var t = tuple
        var j = 4
        while (j >= 0) { chars(j) = ('!' + (t % 85).toInt).toChar; t /= 85; j -= 1 }
        sb.appendAll(chars, 0, n + 1)
      }
      i += n
    }
    sb.append("~>")
    sb.toString.getBytes("ISO-8859-1")
  }

  // ----------------------------------------------------- RunLengthDecode

  /** PDF RunLength (ISO 32000-1 §7.4.5): a length byte L, then either
    * L+1 literal bytes (L ≤ 127) or one byte repeated 257−L times
    * (L ≥ 129); 128 is EOD. A truncated final run is tolerated the same
    * way [[lzwDecode]] tolerates a missing EOD. */
  def runLengthDecode(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(len * 2)
    var i = off
    val end = off + len
    var done = false
    while (i < end && !done) {
      val l = data(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l <= 127) {
        val n = math.min(l + 1, end - i)
        out.write(data, i, n)
        i += n
      } else if (i < end) {
        val b = data(i) & 0xff
        i += 1
        var k = 257 - l
        while (k > 0) { out.write(b); k -= 1 }
      }
    }
    out.toByteArray
  }

  /** Greedy RunLength encoder: runs of ≥2 equal bytes become a repeat
    * record (up to 128 per record), everything else literal records (up to
    * 128 bytes each), closed by the 128 EOD byte. */
  def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + data.length / 128 + 2)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(257 - run)
        out.write(data(i) & 0xff)
        i += run
      } else {
        // literal stretch: stop (exclusive) where a ≥2-byte run begins
        var j = i + 1
        while (j < data.length && j - i < 128 &&
            (j + 1 >= data.length || data(j + 1) != data(j))) j += 1
        out.write(j - i - 1)
        out.write(data, i, j - i)
        i = j
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }
}
