package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One WARC record (ISO 28500): the version line, the named headers, and the
  * exactly-/Content-Length/-sized record block. Header names are matched
  * case-insensitively (the spec makes them case-insensitive; crawlers vary). */
final case class WarcRecord(
    version: String,
    headers: Seq[(String, String)],
    payload: Array[Byte]) {

  def header(name: String): Option[String] = {
    val want = name.toLowerCase(java.util.Locale.ROOT)
    headers.collectFirst {
      case (k, v) if k.toLowerCase(java.util.Locale.ROOT) == want => v
    }
  }
  def warcType: String = header("WARC-Type").getOrElse("")
  def targetUri: String = header("WARC-Target-URI").getOrElse("")
  def date: String = header("WARC-Date").getOrElse("")
}

/** WARC source: the on-disk format Common-Crawl ships, i.e. the upstream of
  * the page table this library's pipeline reads (`input_hint` schema). A
  * 100 TB crawl is ~100k independent ~1 GB `.warc.gz` files, so the natural
  * Spark parallelism unit is the FILE: `binaryFile` rows fan out over
  * executors and each file parses as one sequential stream (gzip members
  * are not splittable mid-file; CC compresses each record as its own gzip
  * member precisely so a stream reader can resynchronise record-by-record —
  * Java's GZIPInputStream concatenates members transparently).
  *
  * Parsing is STREAMING (InputStream → Iterator), so a file never needs a
  * second in-memory copy beyond the record in flight. Malformed input
  * terminates that file's iterator with a Left error — one truncated crawl
  * file must not fail a job — after yielding every record before the
  * damage. */
object Warc {

  /** Guard against a corrupt/hostile Content-Length allocating the world.
    * CC caps response records at ~1 MB; 64 MB is far above any real
    * record. */
  final val MaxRecordBytes: Int = 64 << 20
  private final val MaxHeaderBytes = 1 << 20

  /** Lazily parse every record in a (possibly multi-member-gzip) WARC
    * stream. Elements are Right(record) until exhaustion, or one final
    * Left(error) if the stream is malformed/truncated mid-record.
    *
    * A file must be UNIFORMLY plain or uniformly gzip-membered (the WARC
    * convention; `.warc` vs `.warc.gz`): transport is sniffed once from the
    * leading magic, and plain records appended after gzip members end the
    * member chain (GZIPInputStream treats a non-member trailer as end of
    * stream), silently losing the tail — the same truncation any WARC
    * reader exhibits on that invalid layout. */
  def records(in0: InputStream): Iterator[Either[String, WarcRecord]] = {
    val in = new java.io.BufferedInputStream(in0, 1 << 16)
    val wrapped: Either[String, InputStream] =
      try {
        in.mark(2)
        val b0 = in.read(); val b1 = in.read()
        in.reset()
        if (b0 == 0x1f && b1 == 0x8b) Right(new GZIPInputStream(in, 1 << 16))
        else Right(in)
      } catch { case e: Exception => Left(s"warc: unreadable stream: ${e.getMessage}") }

    wrapped match {
      case Left(err) => Iterator.single(Left(err))
      case Right(stream) => new Iterator[Either[String, WarcRecord]] {
        private var nextElem: Option[Either[String, WarcRecord]] = null
        private var done = false

        private def advance(): Unit = {
          if (done) { nextElem = None; return }
          nextElem = readRecord(stream) match {
            case Right(None)      => done = true; None
            case Right(Some(rec)) => Some(Right(rec))
            case Left(err)        => done = true; Some(Left(err))
          }
          // end-of-iteration closes the stream: GZIPInputStream holds a
          // native-memory Inflater that otherwise waits for the Cleaner —
          // millions of parsed files would accumulate native RSS
          if (done) try stream.close() catch { case _: Exception => }
        }
        override def hasNext: Boolean = {
          if (nextElem == null) advance()
          nextElem.isDefined
        }
        override def next(): Either[String, WarcRecord] = {
          if (!hasNext) throw new NoSuchElementException("warc: exhausted")
          val e = nextElem.get
          nextElem = null
          e
        }
      }
    }
  }

  /** One record: version line, headers to the blank line, Content-Length
    * block, trailing CRLF CRLF. Right(None) = clean end of stream. */
  private def readRecord(in: InputStream): Either[String, Option[WarcRecord]] =
    try {
      var version = readLine(in)
      // tolerate extra blank lines between records (seen in the wild when
      // writers double-terminate)
      while (version != null && version.isEmpty) version = readLine(in)
      if (version == null) return Right(None)
      if (!version.startsWith("WARC/"))
        return Left(s"warc: expected version line, got '${version.take(40)}'")
      val headers = Vector.newBuilder[(String, String)]
      var contentLength = -1L
      var line = readLine(in)
      var headerBytes = 0
      while (line != null && line.nonEmpty) {
        headerBytes += line.length
        if (headerBytes > MaxHeaderBytes) return Left("warc: header section exceeds 1 MB")
        val colon = line.indexOf(':')
        if (colon <= 0) return Left(s"warc: malformed header line '${line.take(40)}'")
        val k = line.substring(0, colon).trim
        val v = line.substring(colon + 1).trim
        headers += (k -> v)
        if (k.equalsIgnoreCase("Content-Length"))
          contentLength = try v.toLong catch { case _: NumberFormatException => -1L }
        line = readLine(in)
      }
      if (line == null) return Left("warc: stream ended inside header section")
      if (contentLength < 0) return Left("warc: missing or invalid Content-Length")
      if (contentLength > MaxRecordBytes)
        return Left(s"warc: Content-Length $contentLength exceeds $MaxRecordBytes guard")
      val payload = new Array[Byte](contentLength.toInt)
      var got = 0
      while (got < payload.length) {
        val n = in.read(payload, got, payload.length - got)
        if (n < 0) return Left(s"warc: stream ended $got/${payload.length} bytes into the block")
        got += n
      }
      // the two record-terminating CRLFs; tolerate EOF right after the
      // final block (truncated terminator loses nothing)
      var i = 0
      var eof = false
      while (i < 2 && !eof) {
        val l = readLine(in)
        if (l == null) eof = true
        else if (l.nonEmpty) return Left(s"warc: expected record terminator, got '${l.take(40)}'")
        i += 1
      }
      Right(Some(WarcRecord(version, headers.result(), payload)))
    } catch {
      case e: LineGuard => Left(s"warc: ${e.getMessage}")
      case e: EOFException => Left(s"warc: truncated gzip member: ${e.getMessage}")
      case e: java.util.zip.ZipException => Left(s"warc: corrupt gzip: ${e.getMessage}")
      case e: Exception => Left(s"warc: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private final class LineGuard extends Exception("header line exceeds 1 MB guard")

  /** CRLF line (the spec's terminator; a bare LF is tolerated, the CR is
    * stripped). Null at end of stream. Bytes decode as UTF-8 — ISO 28500
    * header values (WARC-Target-URI IRIs in particular) are UTF-8, and a
    * byte-as-char copy would mojibake every multibyte URI. The guard fires
    * DURING the read: a hostile newline-free stream must error out, not
    * grow the buffer to the stream size. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (buf.size() >= MaxHeaderBytes) throw new LineGuard
      buf.write(c); c = in.read()
    }
    val bytes = buf.toByteArray
    var n = bytes.length
    if (n > 0 && bytes(n - 1) == '\r') n -= 1
    new String(bytes, 0, n, UTF_8)
  }

  /** Split an HTTP message block into (status+header section, body): the
    * body starts after the FIRST blank line — a body containing its own
    * CRLFCRLF must not re-split (the block is already exactly sized by the
    * WARC Content-Length, so no delimiter scan past the first is needed). */
  def httpSplit(payload: Array[Byte]): (String, Array[Byte]) = {
    var i = 0
    val n = payload.length
    while (i + 3 < n &&
        !(payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    if (i + 3 >= n) (new String(payload, ISO_8859_1), Array.emptyByteArray)
    else (new String(payload, 0, i, ISO_8859_1),
      java.util.Arrays.copyOfRange(payload, i + 4, n))
  }

  /** The `input_hint` page-table schema from raw `.warc`/`.warc.gz` files:
    * one `binaryFile` row per crawl file (the CC parallelism unit — 100k
    * files saturate any executor count without a shuffle), each parsed
    * streaming into its response records' HTTP bodies. Parse errors become
    * a row with null url carrying the message in `warc_error`, so a
    * truncated file degrades to its good prefix plus one diagnostic row
    * instead of failing the job (same error-channel contract as the PDF
    * path). */
  def pages(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        records(new ByteArrayInputStream(content)).flatMap {
          case Right(rec) if rec.warcType == "response" =>
            val (_, body) = httpSplit(rec.payload)
            val ts = try java.sql.Timestamp.from(java.time.Instant.parse(rec.date))
              catch { case _: Exception => null }
            Some((rec.targetUri, ts, body, "", "", path, null: String))
          case Right(_) => None
          case Left(err) =>
            Some((null: String, null: java.sql.Timestamp, null: Array[Byte], "", "", path, err))
        }
      }
      .toDF("url", "warc_ts", "html", "text", "lang", "warc_path", "warc_error")
  }

  /** WET ingestion (Common Crawl's extracted-text sidecar): WET files are
    * WARCs whose `conversion` records carry the ALREADY-extracted plain
    * text directly as the payload — no HTTP envelope — in UTF-8 (the CC
    * convention), with WARC-Refers-To naming the response record they were
    * derived from. Pipelines bootstrap from WET when they want CC's text
    * without paying extraction; this adapter maps WET files to
    * (url, warc_ts, text) rows with [[pages]]'s error-channel contract
    * (a truncated file degrades to its good prefix + one diagnostic row).
    * Non-conversion records (warcinfo, or a stray response) are skipped —
    * an HTTP payload must never masquerade as extracted text. Same 100 TB
    * shape as [[pages]]: one independent file per task, zero shuffles. */
  def wetTexts(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        records(new ByteArrayInputStream(content)).flatMap {
          case Right(rec) if rec.warcType == "conversion" =>
            val ts = try java.sql.Timestamp.from(java.time.Instant.parse(rec.date))
              catch { case _: Exception => null }
            Some((rec.targetUri, ts, new String(rec.payload, UTF_8), path, null: String))
          case Right(_) => None
          case Left(err) =>
            Some((null: String, null: java.sql.Timestamp, null: String, path, err))
        }
      }
      .toDF("url", "warc_ts", "text", "warc_path", "warc_error")
  }

  /** Encode records as WARC bytes — each record optionally its OWN gzip
    * member (the Common-Crawl layout; members concatenate into one valid
    * stream). The write twin of [[records]] and the fixture surface of the
    * gate. */
  def encode(records: Seq[(Seq[(String, String)], Array[Byte])],
      gzipPerRecord: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { case (headers, payload) =>
      val rec = new ByteArrayOutputStream()
      rec.write("WARC/1.0\r\n".getBytes(UTF_8))
      // UTF-8, the ISO 28500 header charset (ASCII-identical for the common
      // case; IRIs in WARC-Target-URI need the multibyte arm)
      headers.foreach { case (k, v) => rec.write(s"$k: $v\r\n".getBytes(UTF_8)) }
      rec.write(s"Content-Length: ${payload.length}\r\n\r\n".getBytes(UTF_8))
      rec.write(payload)
      rec.write("\r\n\r\n".getBytes(ISO_8859_1))
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        gz.write(rec.toByteArray)
        gz.close() // finishes the member AND ends the native Deflater
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }

  /** An HTTP/1.1 200 response block wrapping `body`. */
  def httpResponse(body: Array[Byte], contentType: String = "text/html"): Array[Byte] = {
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\nContent-Length: ${body.length}\r\n\r\n"
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head.getBytes(ISO_8859_1))
    out.write(body)
    out.toByteArray
  }
}
