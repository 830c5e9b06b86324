package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import graft.sources.{Warc, WarcRecord}
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .appName("graft-warc-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .master("local[4]")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rec(tpe: String, uri: String, payload: Array[Byte]) =
    (Seq("WARC-Type" -> tpe, "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2024-01-01T00:00:00Z"), payload)

  private def parseAll(bytes: Array[Byte]): Vector[Either[String, WarcRecord]] =
    Warc.records(new ByteArrayInputStream(bytes)).toVector

  test("round-trip: encode -> parse, plain and gzip-per-record") {
    val recs = Seq(
      rec("warcinfo", "", "software: test\r\n".getBytes(ISO_8859_1)),
      rec("request", "https://a/1", "GET /1 HTTP/1.1\r\n\r\n".getBytes(ISO_8859_1)),
      rec("response", "https://a/1", Warc.httpResponse("hello body".getBytes(UTF_8))))
    for (gz <- Seq(false, true)) {
      val got = parseAll(Warc.encode(recs, gzipPerRecord = gz))
      assert(got.forall(_.isRight), s"gz=$gz: ${got.find(_.isLeft)}")
      val rs = got.collect { case Right(r) => r }
      assert(rs.map(_.warcType) == Vector("warcinfo", "request", "response"))
      assert(rs(2).targetUri == "https://a/1")
      val (head, body) = Warc.httpSplit(rs(2).payload)
      assert(head.startsWith("HTTP/1.1 200 OK"))
      assert(new String(body, UTF_8) == "hello body")
    }
  }

  test("header names are case-insensitive; values trimmed") {
    val bytes = ("WARC/1.0\r\nwarc-type:   response\r\nWARC-TARGET-URI: https://x\r\n" +
      "content-length: 2\r\n\r\nok\r\n\r\n").getBytes(ISO_8859_1)
    val Vector(Right(r)) = parseAll(bytes)
    assert(r.warcType == "response" && r.targetUri == "https://x")
    assert(new String(r.payload, ISO_8859_1) == "ok")
  }

  test("body containing CRLFCRLF is not re-split (Content-Length bounds the block)") {
    val body = "first\r\n\r\nsecond chunk".getBytes(UTF_8)
    val bytes = Warc.encode(Seq(rec("response", "https://b", Warc.httpResponse(body))), gzipPerRecord = false)
    val Vector(Right(r)) = parseAll(bytes)
    val (_, got) = Warc.httpSplit(r.payload)
    assert(new String(got, UTF_8) == "first\r\n\r\nsecond chunk")
  }

  test("truncated block: good prefix survives, one Left terminates the file") {
    val full = Warc.encode(Seq(
      rec("response", "https://c/1", Warc.httpResponse("one".getBytes(UTF_8))),
      rec("response", "https://c/2", Warc.httpResponse("two".getBytes(UTF_8)))), gzipPerRecord = false)
    val cut = java.util.Arrays.copyOf(full, full.length - 20) // inside record 2
    val got = parseAll(cut)
    assert(got.count(_.isRight) == 1)
    assert(got.last.isLeft)
    assert(got.collect { case Right(r) => r.targetUri } == Vector("https://c/1"))
  }

  test("garbage stream and corrupt gzip become a Left, never a throw") {
    assert(parseAll("not a warc at all".getBytes(ISO_8859_1)).exists(_.isLeft))
    val gz = Warc.encode(Seq(rec("response", "https://d", Array[Byte](1, 2, 3))), gzipPerRecord = true)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x5a).toByte // flip a deflate byte
    val got = parseAll(gz)
    assert(got.nonEmpty && got.last.isLeft, got)
  }

  test("missing Content-Length and oversized Content-Length are structured errors") {
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(ISO_8859_1)
    assert(parseAll(noLen).head.swap.exists(_.contains("Content-Length")))
    val huge = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999999999\r\n\r\n")
      .getBytes(ISO_8859_1)
    assert(parseAll(huge).head.swap.exists(_.contains("exceeds")))
  }

  test("UTF-8 WARC-Target-URI round-trips (IRIs are UTF-8 per ISO 28500)") {
    val uri = "https://example.org/café/日本語"
    val got = parseAll(Warc.encode(Seq(rec("response", uri,
      Warc.httpResponse("x".getBytes(UTF_8)))), gzipPerRecord = false))
    assert(got.head.toOption.get.targetUri == uri)
  }

  test("hostile newline-free stream errors at the 1 MB guard instead of buffering the file") {
    val hostile = new java.io.InputStream {
      private var n = 0L
      override def read(): Int = { n += 1; if (n > (64L << 20)) -1 else 'A' }
    }
    val got = Warc.records(hostile).toVector
    assert(got == Vector(Left("warc: header line exceeds 1 MB guard")))
  }

  test("pages(): binaryFile rows -> input_hint schema, per-file error rows, no file lost") {
    // three real .warc/.warc.gz files on disk — two good (one per
    // transport), one truncated mid-block: the adapter must surface both
    // good responses as pages and the damaged file as its good prefix plus
    // one diagnostic row, never fail the job
    import graft.pipeline.Corpus
    val dir = java.nio.file.Files.createTempDirectory("warc_pages_").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.warc").toPath,
        Corpus.warcForDoc(1L, "plain body"))
      java.nio.file.Files.write(new java.io.File(dir, "b.warc.gz").toPath,
        Corpus.warcForDoc(2L, "gzip body"))
      val full = Corpus.warcForDoc(3L, "will truncate")
      java.nio.file.Files.write(new java.io.File(dir, "c.warc").toPath,
        java.util.Arrays.copyOfRange(full, 0, full.length - 30))
      val got = Warc.pages(spark, dir.getAbsolutePath + "/*")
        .selectExpr("url", "cast(html as string) AS body", "warc_error")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val good = got.filter(_._3 == null).sortBy(_._1)
      assert(good.map(_._1).toSeq == Seq(Corpus.UrlPrefix + 1, Corpus.UrlPrefix + 2))
      assert(good.map(_._2).toSeq == Seq("plain body", "gzip body"))
      val errs = got.filter(_._3 != null)
      assert(errs.length == 1 && errs.head._1 == null)
      assert(errs.head._3.startsWith("warc:"), errs.head._3)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

  test("wetTexts(): conversion records only, UTF-8 payloads, decoy response skipped") {
    import graft.pipeline.Corpus
    val dir = java.nio.file.Files.createTempDirectory("warc_wet_").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.wet").toPath,
        Corpus.wetForDoc(1L, "wet text one"))
      java.nio.file.Files.write(new java.io.File(dir, "b.wet.gz").toPath,
        Corpus.wetForDoc(3L, "wet text two")) // %3==0: gzip-member layout
      val got = Warc.wetTexts(spark, dir.getAbsolutePath + "/*")
        .selectExpr("url", "text", "warc_error")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
      // exactly one row per file (the decoy response and warcinfo skipped),
      // the non-ASCII marker survives the UTF-8 read
      assert(got.map(_._1).toSeq == Seq(Corpus.UrlPrefix + 1, Corpus.UrlPrefix + 3))
      assert(got.map(_._2).toSeq ==
        Seq("wet text one ¶wet-1", "wet text two ¶wet-3"))
      assert(got.forall(_._3 == null))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

  test("corpus fixture: 3 records, http headers strip, gzip arm flips with doc_id") {
    import graft.pipeline.Corpus
    for (id <- Seq(6L, 7L)) {
      val bytes = Corpus.warcForDoc(id, "warc gate text")
      // even ids gzip each record: magic must (not) lead
      assert(((bytes(0) & 0xff) == 0x1f) == (id % 2 == 0))
      val rs = parseAll(bytes).collect { case Right(r) => r }
      assert(rs.map(_.warcType) == Vector("warcinfo", "request", "response"))
      val (_, body) = Warc.httpSplit(rs(2).payload)
      assert(new String(body, UTF_8) == "warc gate text")
      assert(rs(2).targetUri == Corpus.UrlPrefix + id)
    }
  }
}
