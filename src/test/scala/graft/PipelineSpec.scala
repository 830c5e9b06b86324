package graft

import graft.dedup.Dedup
import graft.pipeline.{Checkpoint, Corpus, ExtractPipeline, PageRow}
import graft.streaming.Events
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end Spark tests of the extraction pipeline and the training-data
  * operators, on tiny in-memory corpora (the sf tables are exercised by the
  * driver's Verify gate; these cover edge cases the synthetic tables lack). */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-pipeline-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .master("local[4]")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def roundTrip(texts: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val pages = texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
    val out = ExtractPipeline.run(pages, delimiter = "").collect().map(d => d.url -> d).toMap
    texts.foreach { case (id, t) =>
      val d = out(Corpus.UrlPrefix + id)
      assert(d.error == "" || id % 2 == 0 && Corpus.pdfVariant(id) == 7,
        s"doc $id error: ${d.error}") // variant 7 records tolerated-malformation notes
      assert(d.decode_failures == 0, s"doc $id failures: ${d.error}")
      val want = if (id % 2 == 0) Corpus.pdfExpectedText(id, t) else t
      assert(d.text == want, s"doc $id: got ${d.text.take(80)}... want ${want.take(80)}...")
      assert(d.kind == (if (id % 2 == 0) "pdf" else "html"))
    }
  }

  test("pdf+html round-trip: plain, specials, long, short, all 9 pdf variants") {
    val long = ("the quick brown fox jumps over seventeen lazy dogs daily " * 12).trim
    val texts = Seq[(Long, String)](
      0L -> "hello world",
      1L -> "hello world",
      2L -> long, // variant 1: Td/TD/T* newlines over a multi-page doc
      3L -> long,
      4L -> "parens (nested (deep)) and backslash \\ and ) stray", // variant 2: rot13 font
      5L -> "amp & lt < gt > mixed &amp; entities",
      6L -> "x", // single char, variant 3: encrypted
      7L -> "y",
      8L -> long, // variant 4: xref stream + ObjStm
      10L -> long, // variant 5: Tm newlines
      12L -> long, // variant 6: incremental update
      14L -> long, // variant 7: malformed tolerances
      // NumPdfVariants is 9, so the variant of doc id is (id/2) % 9:
      16L -> "It's quoted: 'single' and `backtick` and \"double\"", // variant 8: linearized front-xref
      18L -> long, // variant 0 on a multi-page doc
      22L -> "MiXeD CaSe RoT13 text With Digits 0123456789 and UPPER lower") // variant 2: rot13 font is case-sensitive
    roundTrip(texts)
  }

  test("pdf span/page accounting matches the chunking contract") {
    import spark.implicits._
    val t = "z" * 1000 // 16 chunks -> 2 pages
    val pages = Seq(Corpus.pageRowFor(42L, t, "en")).toDS()
    val d = ExtractPipeline.run(pages, delimiter = "").collect().head
    assert(d.pages == Corpus.pdfPageCount(t))
    assert(d.pages == 2)
    assert(d.spans.length == 2)
    assert(d.spans.map(s => d.text.substring(s.start, s.end)).mkString
      == Corpus.pdfExpectedText(42L, t))
  }

  test("runMetrics agrees with run on kind/pages/chars/failures across all variants and delimiters") {
    import spark.implicits._
    val long = ("metrics parity corpus with plenty of words to span pages " * 12).trim
    val pages = (0L until 20L).map(i => Corpus.pageRowFor(i, long, "en")).toDS()
    def key(url: String, kind: String, pages: Int, chars: Int, fails: Int) =
      url -> ((kind, pages, chars, fails))
    for (delim <- Seq("", "|")) {
      val full = ExtractPipeline.run(pages, delimiter = delim).collect()
        .map(d => key(d.url, d.kind, d.pages, d.n_chars, d.decode_failures)).toMap
      val metrics = ExtractPipeline.runMetrics(pages, delimiter = delim).collect()
        .map(d => key(d.url, d.kind, d.pages, d.n_chars, d.decode_failures)).toMap
      assert(metrics == full, s"delimiter '$delim'")
    }
  }

  test("malformed payload becomes an error row, not an exception") {
    import spark.implicits._
    val junk = "%PDF-1.4 this is not really a pdf".getBytes("ISO-8859-1")
    val pages = Seq(PageRow("u1", new java.sql.Timestamp(0), junk, "", "en")).toDS()
    val d = ExtractPipeline.run(pages).collect().head
    assert(d.decode_failures >= 1)
    assert(d.error.nonEmpty)
    assert(d.kind == "pdf")
  }

  test("checkpoint commit + resume skips completed urls") {
    import spark.implicits._
    val texts = (0L until 20L).map(i => i -> s"document number $i with some words")
    val pages = texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_ckpt").toString
    val first = ExtractPipeline.run(pages.where(element_at(split(col("url"), "/"), -1).cast("long") < 5))
    Checkpoint.commit(first, outDir)
    val remaining = Checkpoint.resume(pages, outDir)
    val ids = remaining.collect().map(_.url.split("/").last.toLong).sorted
    assert(ids.toSeq == (5L until 20L).toSeq)
    // committing the rest empties the backlog
    Checkpoint.commit(ExtractPipeline.run(remaining), outDir)
    assert(Checkpoint.resume(pages, outDir).count() == 0)
    val m = Checkpoint.metrics(spark, outDir).collect().head
    assert(m.getAs[Long]("docs_done") == 20L)
  }

  test("atomic commit: an orphan (unmanifested) data batch is invisible and its urls re-run") {
    import spark.implicits._
    val texts = (0L until 10L).map(i => i -> s"document number $i body words here")
    val pages = texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
    def docId = element_at(split(col("url"), "/"), -1).cast("long")
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_atomic").toString
    Checkpoint.commitWithData(ExtractPipeline.run(pages.where(docId < 4)), outDir)
    assert(Checkpoint.readExtracted(spark, outDir).count() == 4)
    // crash window between data rename and manifest rename: data batch
    // exists on disk but no manifest references it
    ExtractPipeline.run(pages.where(docId >= 4)).toDF()
      .write.parquet(Checkpoint.dataPath(outDir) + "/batch_orphan")
    assert(Checkpoint.readExtracted(spark, outDir).count() == 4, "orphan batch leaked into reads")
    val remaining = Checkpoint.resume(pages, outDir)
    assert(remaining.count() == 6, "orphaned urls must be re-extracted")
    Checkpoint.commitWithData(ExtractPipeline.run(remaining), outDir)
    val out = Checkpoint.readExtracted(spark, outDir)
    assert(out.count() == 10)
    assert(out.select("url").distinct().count() == 10, "duplicate rows after crash-resume")
    assert(Checkpoint.resume(pages, outDir).count() == 0)
    // vacuum: the orphan is removable once past the grace window, but a
    // fresh (possibly in-flight) orphan inside it is protected
    assert(Checkpoint.vacuum(spark, outDir).isEmpty,
      "default grace must protect a freshly-written orphan")
    val removed = Checkpoint.vacuum(spark, outDir, graceMs = -1000L)
    assert(removed == Seq("batch_orphan"), s"removed=$removed")
    assert(Checkpoint.readExtracted(spark, outDir).count() == 10,
      "vacuum must not touch referenced batches")
    assert(Checkpoint.vacuum(spark, outDir, graceMs = -1000L).isEmpty)
  }

  test("compact: content identical, one data batch remains, resume stays empty, manifest-only kept") {
    import spark.implicits._
    val texts = (0L until 12L).map(i => i -> s"document number $i body words here")
    val pages = texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
    def docId = element_at(split(col("url"), "/"), -1).cast("long")
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_compact").toString
    (0 until 3).foreach(r => Checkpoint.commitWithData(
      ExtractPipeline.run(pages.where(docId % 4 === r)), outDir))
    // a manifest-only commit (work done elsewhere, no data) must survive
    Checkpoint.commit(ExtractPipeline.run(pages.where(docId % 4 === 3)), outDir)
    // sorted SEQUENCES, not sets: a rewrite that duplicated or dropped a
    // row is exactly what this comparison must catch
    def content() = Checkpoint.readExtracted(spark, outDir)
      .select("url", "text", "n_chars").collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val before = content()
    def dataBatchDirs = new java.io.File(Checkpoint.dataPath(outDir))
      .listFiles.filter(f => f.isDirectory && f.getName.startsWith("batch_")).toSeq
    assert(dataBatchDirs.size == 3)
    val newBatch = Checkpoint.compact(spark, outDir)
    assert(newBatch.isDefined)
    assert(dataBatchDirs.map(_.getName) == Seq(newBatch.get), "exactly the compacted batch remains")
    assert(content() == before, "compaction must not change table content")
    assert(!new java.io.File(Checkpoint.maintenanceLockPath(outDir)).exists,
      "maintenance lock must be released")
    assert(Checkpoint.resume(pages, outDir).count() == 0,
      "every url (incl. the manifest-only commit's) must stay done")
    val m = Checkpoint.metrics(spark, outDir).collect().head
    assert(m.getAs[Long]("docs_done") == 12L)
    // nothing left to compact
    assert(Checkpoint.compact(spark, outDir).isEmpty)
  }

  test("maintenance lock: resume refuses mid-compaction; stale locks are reclaimed") {
    import spark.implicits._
    val texts = (0L until 6L).map(i => i -> s"document number $i body words here")
    val pages = texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
    def docId = element_at(split(col("url"), "/"), -1).cast("long")
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_lock").toString
    (0 until 2).foreach(r => Checkpoint.commitWithData(
      ExtractPipeline.run(pages.where(docId % 2 === r)), outDir))
    // simulate an in-flight compact: a fresh lock file
    val lock = new java.io.File(Checkpoint.maintenanceLockPath(outDir))
    assert(lock.createNewFile())
    val ex = intercept[IllegalStateException](Checkpoint.resume(pages, outDir).count())
    assert(ex.getMessage.contains("maintenance in progress"))
    val ex2 = intercept[IllegalStateException](Checkpoint.compact(spark, outDir))
    assert(ex2.getMessage.contains("maintenance already in progress"))
    // a crashed compact's stale lock must not wedge the sink forever
    assert(lock.setLastModified(System.currentTimeMillis() - Checkpoint.MaintenanceLockStaleMs - 1000))
    assert(Checkpoint.resume(pages, outDir).count() == 0) // stale lock ignored
    assert(Checkpoint.compact(spark, outDir).isDefined)   // stale lock reclaimed
    assert(!lock.exists, "lock released after compaction")
  }

  test("maintenance lock: heartbeat keeps a long-running holder live past staleMs") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_beat").toString
    val lock = new java.io.File(Checkpoint.maintenanceLockPath(outDir))
    // without the heartbeat, a holder that outlives staleMs loses lock
    // protection mid-flight: after the sleep the mtime would be > staleMs
    // old and a competing acquire would reclaim the LIVE lock
    Checkpoint.withMaintenanceLock(spark, outDir, staleMs = 4000L) {
      Thread.sleep(5000L) // outlive staleMs inside the critical section
      val age = System.currentTimeMillis() - lock.lastModified()
      assert(age < 4000L, s"heartbeat must keep the lock fresh, age=$age ms")
      val ex = intercept[IllegalStateException](
        Checkpoint.withMaintenanceLock(spark, outDir, staleMs = 4000L)(()))
      assert(ex.getMessage.contains("maintenance already in progress"),
        "a live heartbeated lock must still repel competing maintenance")
    }
    assert(!lock.exists, "lock released after the body returns")
  }

  test("vacuum serializes with compact via the maintenance lock") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_vlock").toString
    new java.io.File(outDir).mkdirs()
    val lock = new java.io.File(Checkpoint.maintenanceLockPath(outDir))
    assert(lock.createNewFile()) // fresh foreign lock = compact in flight
    // racing a compact, vacuum could delete the just-published compacted
    // data dir (unreferenced between compact's steps 2 and 4) — it must
    // refuse while the lock is live
    val ex = intercept[IllegalStateException](Checkpoint.vacuum(spark, outDir))
    assert(ex.getMessage.contains("maintenance already in progress"))
    lock.delete()
    assert(Checkpoint.vacuum(spark, outDir).isEmpty) // empty sink, lock free
    assert(!lock.exists, "vacuum releases the lock it took")
  }

  test("query inventory: every query has an oracle and the count is pinned") {
    // the README/NOTES quote this number; pinning it here keeps the prose
    // from drifting (r4 verdict item 7). Update BOTH on every new query.
    assert(SparkEntry.queries.size == 100,
      s"queries=${SparkEntry.queries.size} — update this pin AND README.md")
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      "every query needs a DuckDB oracle (and no orphaned oracles): " +
        (SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet).mkString(",") + " | " +
        (SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet).mkString(","))
  }

  test("Recrawl.delta: presence flags beat null fingerprints; toExtract filters") {
    import spark.implicits._
    val prev = Seq(("u1", "a"), ("u2", "b"), ("u3", null), ("u4", "d")).toDF("url", "fp")
    val next = Seq(("u1", "a"), ("u2", "B"), ("u3", null), ("u5", "e")).toDF("url", "fp")
    val d = graft.pipeline.Recrawl.delta(prev, next, "url", "fp")
      .as[(String, String)].collect().toMap
    assert(d == Map(
      "u1" -> "unchanged",
      "u2" -> "changed",
      "u3" -> "changed", // null fp present on BOTH sides is never unchanged
      "u4" -> "removed",
      "u5" -> "added"))
    val work = graft.pipeline.Recrawl.toExtract(next,
      graft.pipeline.Recrawl.delta(prev, next, "url", "fp"), "url")
      .select("url").as[String].collect().toSet
    assert(work == Set("u2", "u3", "u5"))
  }

  test("TopK.topKPerKey: rank order, tie-break, partitioning independence, guards") {
    import spark.implicits._
    val rows = Seq(
      ("a", 5L, 10L), ("a", 9L, 11L), ("a", 9L, 3L), ("a", 1L, 12L), ("a", 7L, 2L),
      ("b", 4L, 20L),
      // Long.MinValue score must rank LAST, not overflow to best
      ("c", Long.MinValue, 30L), ("c", 0L, 31L))
    def run(parts: Int) = graft.functions.TopK.topKPerKey(
        rows.toDF("k", "score", "id").repartition(parts), "k", "score", "id", 3)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val expected = Seq(
      ("a", 1L, 3L, 9L), ("a", 2L, 11L, 9L), ("a", 3L, 2L, 7L), // id asc on the 9-tie
      ("b", 1L, 20L, 4L),
      ("c", 1L, 31L, 0L), ("c", 2L, 30L, Long.MinValue))
    assert(run(1) == expected)
    assert(run(7) == expected) // merge path: same result on any partitioning
    intercept[IllegalArgumentException] {
      graft.functions.TopK.topKPerKey(
        Seq(("a", 1.5, 1L)).toDF("k", "score", "id"), "k", "score", "id", 3)
    }
    intercept[IllegalArgumentException] {
      graft.functions.TopK.topKPerKey(
        Seq((1L, 1L, 1L)).toDF("k", "score", "id"), "k", "score", "id", 3)
    }
  }

  test("Frontier.allowed: per-host policies, missing robots, null url, columns preserved") {
    import spark.implicits._
    val targets = Seq(
      (1L, "https://a.com/private/x"), // a.com blocks /private/
      (2L, "https://a.com/pub/x"),
      (3L, "https://b.com/anything"),  // b.com has no robots.txt row
      (4L, "https://A.COM/private/y"), // host matching is case-insensitive
      (5L, null.asInstanceOf[String])  // null url: not fetchable
    ).toDF("id", "url")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /private/"))
      .toDF("host", "robots_txt")
    val out = graft.sources.Frontier.allowed(targets, "url", robots)
    assert(out.columns.toSeq == Seq("id", "url", "allowed"))
    val m = out.select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(m == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false, 5L -> false))
    // a duplicated robots host row must not duplicate frontier urls
    val dup = Seq(("a.com", "User-agent: *\nDisallow: /private/"),
      ("a.com", "User-agent: *\nDisallow: /private/")).toDF("host", "robots_txt")
    assert(graft.sources.Frontier.allowed(targets, "url", dup).count() == 5)
  }

  test("Funnel: first-fail verdict order and attrition report") {
    import spark.implicits._
    // all-distinct bigrams (dup 0), gopher-clean, langId-predicts-en
    val good = "the be to of and that have with " +
      (1 to 60).map("word" + _).mkString(" ")
    val docs = Seq(
      // blocked AND wrong lang: blocked_url wins (stage order)
      (1L, "https://x.bad.com/p", "zz", good),
      (2L, "https://ok.com/p", "zz", good),                   // wrong_lang
      (3L, "https://ok.com/p", "en", "the and of to a few"),  // gopher_fail (6 words)
      (4L, "https://ok.com/p", "en",
        good + (" zqzqzq zqzqzq" * 400)),                     // repetitive
      (5L, "https://ok.com/p", "en", good),                   // kept
      // extraction-failed documents fail CLOSED, never "kept"
      (6L, "https://ok.com/p", "en", null.asInstanceOf[String]),
      (7L, "https://ok.com/p", "en", "   ")
    ).toDF("doc_id", "url", "lang", "text")
    val bl = Seq("bad.com").toDF("domain")
    val v = graft.functions.Funnel
      .verdicts(docs, "doc_id", "url", "lang", "text", bl, minWords = 15)
    assert(v.as[(Long, String)].collect().toMap == Map(
      1L -> "blocked_url", 2L -> "wrong_lang", 3L -> "gopher_fail",
      4L -> "repetitive", 5L -> "kept",
      6L -> "gopher_fail", 7L -> "gopher_fail"))
    val r = graft.functions.Funnel.report(v)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, "blocked_url", 1L, 6L), (1L, "wrong_lang", 1L, 5L),
      (2L, "gopher_fail", 3L, 2L), (3L, "repetitive", 1L, 1L),
      (4L, "kept", 0L, 1L)))
    // a stage that drops nothing still appears with n_dropped = 0
    val r2 = graft.functions.Funnel
      .report(Seq("kept", "kept").toDF("verdict"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r2.map(x => (x._2, x._3, x._4)) == Seq(
      ("blocked_url", 0L, 2L), ("wrong_lang", 0L, 2L), ("gopher_fail", 0L, 2L),
      ("repetitive", 0L, 2L), ("kept", 0L, 2L)))
  }

  test("chunkWindows: boundaries, overlap content, tail chunk, empty docs") {
    import spark.implicits._
    def words(n: Int): String = (1 to n).map("w" + _).mkString(" ")
    val docs = Seq(
      (1L, words(5)),   // n <= W: one chunk
      (2L, words(10)),  // n == W exactly: one chunk
      (3L, words(16)),  // tail chunk of 16 - 6 = 10? no: starts 0,6 -> 10 tokens
      (4L, words(22)),  // starts 0,6,12 -> last = 10 tokens ending at 22
      (5L, "   "),      // whitespace-only: no chunks
      (6L, words(11))   // one past W: second chunk is the 6-token overlap tail
    ).toDF("doc_id", "text")
    val out = graft.functions.Chunking
      .chunkWindows(docs, "doc_id", "text", windowTokens = 10, overlapTokens = 4)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(out(1L) == Seq((1L, 0L, 5L, words(5))))
    assert(out(2L) == Seq((2L, 0L, 10L, words(10))))
    // stride 6: chunk 1 = w7..w16 — shares w7..w10 with chunk 0 (overlap 4)
    assert(out(3L) == Seq(
      (3L, 0L, 10L, (1 to 10).map("w" + _).mkString(" ")),
      (3L, 1L, 10L, (7 to 16).map("w" + _).mkString(" "))))
    assert(out(4L).map(c => (c._2, c._4.split(" ").head, c._4.split(" ").last, c._3)) ==
      Seq((0L, "w1", "w10", 10L), (1L, "w7", "w16", 10L), (2L, "w13", "w22", 10L)))
    assert(!out.contains(5L))
    assert(out(6L) == Seq(
      (6L, 0L, 10L, (1 to 10).map("w" + _).mkString(" ")),
      (6L, 1L, 5L, (7 to 11).map("w" + _).mkString(" "))))
    // every chunk but the last is exactly W tokens; concatenating chunks at
    // stride offsets reproduces the document (no token lost or duplicated
    // beyond the declared overlap)
    intercept[IllegalArgumentException] {
      graft.functions.Chunking.chunkWindows(docs, "doc_id", "text", 10, 10)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Chunking.chunkWindows(docs, "doc_id", "text", 0, 0)
    }
  }

  test("packSequences / mixByTokenBudget refuse non-integral id columns") {
    import spark.implicits._
    // a fractional id truncates under cast("long") — distinct docs silently
    // merge into one doc_id/stream — and a non-numeric id nulls out and
    // dies later in the tuple encoder with an opaque error
    val rows = Seq((1.5, "g", "a b c"), (2.0, "g", "d e"))
      .toDF("doc_id", "grp", "text")
    val e1 = intercept[IllegalArgumentException](
      graft.pipeline.Packing.packSequences(rows, "doc_id", "text", 8L, 2))
    assert(e1.getMessage.contains("must be integral"))
    val e2 = intercept[IllegalArgumentException](
      graft.functions.Sampling.mixByTokenBudget(rows, "grp", "doc_id", "text", 10L))
    assert(e2.getMessage.contains("must be integral"))
  }

  test("snapshot time travel: readExtractedAsOf sees exactly the batches committed by then") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_tt").toString
    def commitRange(lo: Long, hi: Long): Unit = {
      val pages = (lo until hi).map(i => Corpus.pageRowFor(i, s"time travel doc $i", "en")).toDS()
      Checkpoint.commitWithData(ExtractPipeline.run(pages), outDir)
      Thread.sleep(20) // distinct manifest mtimes on a coarse-granularity fs
    }
    commitRange(0, 3); commitRange(3, 7); commitRange(7, 12)
    // a manifest-ONLY commit (no data batch) must not break as-of reads
    val extra = Seq(Corpus.pageRowFor(100L, "manifest only doc", "en")).toDS()
    Checkpoint.commit(ExtractPipeline.run(extra), outDir)
    val snaps = Checkpoint.snapshots(spark, outDir)
    assert(snaps.length == 4)
    assert(snaps.map(_.commitMs).sliding(2).forall(p => p.head <= p.last))
    assert(Checkpoint.readExtractedAsOf(spark, outDir, snaps(0).commitMs).count() == 3)
    assert(Checkpoint.readExtractedAsOf(spark, outDir, snaps(1).commitMs).count() == 7)
    assert(Checkpoint.readExtractedAsOf(spark, outDir, snaps(2).commitMs).count() == 12)
    assert(Checkpoint.readExtractedAsOf(spark, outDir, snaps(3).commitMs).count() == 12)
    assert(Checkpoint.readExtractedAsOf(spark, outDir, snaps(0).commitMs - 1).count() == 0)
    // as-of the newest snapshot == the current table
    assert(Checkpoint.readExtracted(spark, outDir).count() == 12)
  }

  test("table-format seam: commit + crash-orphan + resume round-trips under ORC") {
    import spark.implicits._
    val texts = (0L until 12L).map(i => i -> s"orc seam document $i body words")
    val pages = texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
    def docId = element_at(split(col("url"), "/"), -1).cast("long")
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_orc").toString
    spark.conf.set("spark.graft.table.format", "orc")
    try {
      Checkpoint.commitWithData(ExtractPipeline.run(pages.where(docId < 5)), outDir)
      assert(Checkpoint.readExtracted(spark, outDir).count() == 5)
      // data files really are ORC, not parquet
      val batchDirs = new java.io.File(Checkpoint.dataPath(outDir)).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      assert(batchDirs.nonEmpty)
      assert(batchDirs.flatMap(_.listFiles()).exists(_.getName.endsWith(".orc")),
        "expected .orc data files under the committed batch")
      // crash window: orphan ORC batch is invisible until committed
      ExtractPipeline.run(pages.where(docId >= 5)).toDF()
        .write.orc(Checkpoint.dataPath(outDir) + "/batch_orphan")
      assert(Checkpoint.readExtracted(spark, outDir).count() == 5)
      val remaining = Checkpoint.resume(pages, outDir)
      assert(remaining.count() == 7)
      Checkpoint.commitWithData(ExtractPipeline.run(remaining), outDir)
      val out = Checkpoint.readExtracted(spark, outDir)
      assert(out.count() == 12 && out.select("url").distinct().count() == 12)
      assert(Checkpoint.resume(pages, outDir).count() == 0)
    } finally spark.conf.unset("spark.graft.table.format")
  }

  test("legacy pre-atomic layout: flat data files stay readable and their urls stay done") {
    import spark.implicits._
    val texts = (0L until 8L).map(i => i -> s"legacy layout document $i words")
    val pages = texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_legacy").toString
    // simulate an old run: data as FLAT part-files under extracted/, manifest
    // as flat part-files under _manifest/ without a `batch` column
    val done = ExtractPipeline.run(pages)
    done.toDF().coalesce(1).write.parquet(s"$outDir/.legacy_stage")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(Checkpoint.dataPath(outDir)))
    new java.io.File(s"$outDir/.legacy_stage").listFiles()
      .filter(_.getName.startsWith("part-")).foreach { f =>
        fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
          new org.apache.hadoop.fs.Path(s"${Checkpoint.dataPath(outDir)}/${f.getName}"))
      }
    done.select("url", "n_chars", "decode_failures")
      .withColumn("part_id", spark_partition_id())
      .coalesce(1).write.parquet(s"$outDir/.legacy_man")
    fs.mkdirs(new org.apache.hadoop.fs.Path(Checkpoint.manifestPath(outDir)))
    new java.io.File(s"$outDir/.legacy_man").listFiles()
      .filter(_.getName.startsWith("part-")).foreach { f =>
        fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
          new org.apache.hadoop.fs.Path(s"${Checkpoint.manifestPath(outDir)}/${f.getName}"))
      }
    // the committed legacy output is readable through the standard reader...
    assert(Checkpoint.readExtracted(spark, outDir).count() == 8)
    // ...its urls stay done, and a new-layout commit coexists with it
    assert(Checkpoint.resume(pages, outDir).count() == 0)
    val more = (100L until 104L).map(i => Corpus.pageRowFor(i, s"new doc $i", "en")).toDS()
    Checkpoint.commitWithData(ExtractPipeline.run(more), outDir)
    assert(Checkpoint.readExtracted(spark, outDir).count() == 12)
    assert(Checkpoint.metrics(spark, outDir).collect().head.getAs[Long]("docs_done") == 12)
    // time travel spans the legacy commit too: as of the legacy manifest's
    // snapshot only the 8 legacy rows exist; as of the newest, all 12
    val snaps = Checkpoint.snapshots(spark, outDir)
    assert(snaps.length == 2 && snaps.head.name.isEmpty)
    assert(Checkpoint.readExtractedAsOf(spark, outDir, snaps.head.commitMs).count() == 8)
    assert(Checkpoint.readExtractedAsOf(spark, outDir, snaps.last.commitMs).count() == 12)
  }

  test("exactly-once: ORPHAN legacy flat data (no legacy manifest) stays invisible") {
    import spark.implicits._
    val texts = (0L until 6L).map(i => i -> s"orphan legacy doc $i words")
    val pages = texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
    val outDir = java.nio.file.Files.createTempDirectory("graft_spec_orphleg").toString
    // a legacy run crashed AFTER writing flat data, BEFORE its manifest:
    // flat part-files exist, but no manifest vouches for them
    ExtractPipeline.run(pages.limit(3)).toDF().coalesce(1).write.parquet(s"$outDir/.stage")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(Checkpoint.dataPath(outDir)))
    new java.io.File(s"$outDir/.stage").listFiles()
      .filter(_.getName.startsWith("part-")).foreach { f =>
        fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
          new org.apache.hadoop.fs.Path(s"${Checkpoint.dataPath(outDir)}/${f.getName}"))
      }
    // a NEW-layout commit must not make the orphan visible
    Checkpoint.commitWithData(ExtractPipeline.run(pages), outDir)
    val out = Checkpoint.readExtracted(spark, outDir)
    assert(out.count() == 6, "orphan legacy flat files leaked into reads")
    assert(out.select("url").distinct().count() == 6, "duplicate urls from orphan leak")
  }

  test("sizeRouted: both lanes preserve rows and extraction is unchanged") {
    import spark.implicits._
    val tiny = (0L until 40L).map(i => Corpus.pageRowFor(i, s"small doc $i words", "en"))
    val big = Seq(Corpus.pageRowFor(1000L, "huge " * 40000, "en")) // ~200 KB payload
    val pages = (tiny ++ big).toDS()
    val routed = ExtractPipeline.sizeRouted(pages, numPartitions = 4, bigBytes = 100 * 1024)
    assert(routed.count() == 41)
    val a = ExtractPipeline.run(routed).collect().map(d => d.url -> d.text).toMap
    val b = ExtractPipeline.run(pages).collect().map(d => d.url -> d.text).toMap
    assert(a == b)
  }

  test("captureLines: pdf span source lines match the reference's CR/LF/CRLF rules") {
    import spark.implicits._
    val t = ("alpha beta gamma delta " * 40).trim // multi-page pdf (even id)
    val pages = Seq(Corpus.pageRowFor(42L, t, "en")).toDS()
    val d = ExtractPipeline.run(pages, delimiter = "", captureLines = true).collect().head
    assert(d.spans.nonEmpty)
    val raw = Corpus.pdfForDoc(42L, t) // deterministic: same bytes the corpus built
    d.spans.foreach { s =>
      // independent line count over the raw bytes: CR, LF, CRLF = 1 each
      var line = 1
      var i = 0
      while (i < s.src_offset) {
        (raw(i): @unchecked) match {
          case 0x0d => line += 1; if (i + 1 < raw.length && raw(i + 1) == 0x0a) i += 1
          case 0x0a => line += 1
          case _ =>
        }
        i += 1
      }
      assert(s.src_line == line, s"span at ${s.src_offset}")
      assert(s.src_line > 1) // content streams sit well below the header
    }
    // bulk path default: lines off, sentinel -1
    val bulk = ExtractPipeline.run(pages, delimiter = "").collect().head
    assert(bulk.spans.forall(_.src_line == -1))
  }

  test("captureLines: html span source lines match an independent newline count") {
    import spark.implicits._
    val t = ("alpha beta gamma delta " * 20).trim
    val pages = Seq(Corpus.pageRowFor(43L, t, "en")).toDS() // odd id -> html
    val d = ExtractPipeline.run(pages, delimiter = "", captureLines = true).collect().head
    assert(d.kind == "html" && d.spans.nonEmpty)
    val html = new String(Corpus.htmlFromText(t, 43L), java.nio.charset.StandardCharsets.UTF_8)
    d.spans.foreach { s =>
      val want = 1 + html.substring(0, s.src_offset).count(_ == '\n')
      assert(s.src_line == want, s"span at ${s.src_offset}")
      assert(s.src_line > 1)
    }
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("minhash LSH finds planted near-duplicates and nothing else") {
    val base = (0L until 30L).map(i =>
      i -> (0 to 30).map(j => s"w${i}q$j").mkString(" "))
    val nearDups = base.take(5).map { case (id, t) => (id + 1000L) -> (t + " tail") }
    val docs = docsDf(base ++ nearDups)
    val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq == (0L until 5L).map(i => (i, i + 1000L)))
    // and the exact inverted-index path agrees
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(exact.toSeq == pairs.toSeq)
  }

  test("simhash: identical docs collide, distinct docs don't") {
    val base = (0L until 20L).map(i =>
      i -> (0 to 40).map(j => s"t${(i * 53 + j * 11) % 89}x$j").mkString(" "))
    val copies = base.take(3).map { case (id, t) => (id + 500L) -> t }
    val pairs = Dedup.simhashPairs(
        Dedup.simhashes(docsDf(base ++ copies), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq == (0L until 3L).map(i => (i, i + 500L)))
  }

  test("salted repartition spreads a skewed corpus evenly by bytes") {
    import spark.implicits._
    // 1 giant doc (500 KB text -> multi-MB pdf) + 600 tiny docs, written as
    // ONE parquet file: without salting, whichever task gets the file gets
    // everything; salted() spreads rows across all partitions
    val giant = Corpus.pageRowFor(0L, "x" * 500000, "en")
    val tiny = (1L to 600L).map(i => Corpus.pageRowFor(i, s"tiny doc number $i", "en"))
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    (giant +: tiny).toDS().coalesce(1).write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir)
      .as[PageRow](org.apache.spark.sql.Encoders.product[PageRow])
    val salted = ExtractPipeline.salted(pages, 8)
    val perPart = salted.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPart.length == 8)
    assert(perPart.count(_ > 0) >= 6, perPart.mkString(",")) // spread, not piled
    // extraction result unchanged by the repartition
    val a = ExtractPipeline.run(pages).select("url", "n_chars").collect().toSet
    val b = ExtractPipeline.run(salted).select("url", "n_chars").collect().toSet
    assert(a == b)
  }

  test("streaming extraction (readStream -> mapPartitions -> sink) matches batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_pages").toString
    val texts = (0L until 30L).map(i => i -> s"streaming corpus document $i with words")
    texts.map { case (id, t) => Corpus.pageRowFor(id, t, "en") }.toDS()
      .write.mode("overwrite").parquet(s"$dir/in")
    val batch = ExtractPipeline.run(
        spark.read.parquet(s"$dir/in").as[PageRow](org.apache.spark.sql.Encoders.product[PageRow]))
      .select("url", "kind", "text").orderBy("url").collect()

    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
      .as[PageRow](org.apache.spark.sql.Encoders.product[PageRow])
    val q = ExtractPipeline.runStreaming(streamIn)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("graft_extract_stream")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT url, kind, text FROM graft_extract_stream")
      .orderBy("url").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stateful streaming dedup keeps only first-seen fingerprints across batches") {
    import spark.implicits._
    import graft.streaming.{FingerprintedDoc, StreamDedup}
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    // two files processed as separate micro-batches (maxFilesPerTrigger=1);
    // the duplicate fp in file 2 must be suppressed by cross-batch state
    Seq(FingerprintedDoc("fpA", "u1", "alpha"), FingerprintedDoc("fpB", "u2", "beta"))
      .toDS().coalesce(1).write.parquet(s"$dir/in/f1")
    Seq(FingerprintedDoc("fpA", "u3", "alpha again"), FingerprintedDoc("fpC", "u4", "gamma"))
      .toDS().coalesce(1).write.parquet(s"$dir/in/f2")
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*")
      .as[FingerprintedDoc]
    val q = StreamDedup.firstSeenOnly(streamIn)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sdedup")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.sql("SELECT fp, url FROM graft_sdedup").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet == Set("fpA", "fpB", "fpC"))
    assert(out("fpB") == "u2" && out("fpC") == "u4")
    assert(out("fpA") == "u1" || out("fpA") == "u3") // first batch order wins when batched separately
  }

  test("streaming minhash-LSH emits the batch candidate set across micro-batches") {
    import spark.implicits._
    import graft.streaming.StreamMinhash
    // base docs in batch 1, near-dup copies in batch 2: every pair must be
    // flagged when the SECOND member arrives, via cross-batch bucket state
    val base = (0L until 20L).map(i => i -> (0 to 30).map(j => s"w${i}q$j").mkString(" "))
    val dups = base.take(6).map { case (id, t) => (id + 1000L) -> (t + " tail") }
    val dir = java.nio.file.Files.createTempDirectory("graft_sminhash").toString
    base.toDF("id", "text").coalesce(1).write.parquet(s"$dir/in/f1")
    dups.toDF("id", "text").coalesce(1).write.parquet(s"$dir/in/f2")
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*").as[(Long, String)]
    val q = StreamMinhash.candidatePairs(StreamMinhash.bandedStream(streamIn))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sminhash")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT DISTINCT id_a, id_b FROM graft_sminhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashCandidates(
        Dedup.minhashBands((base ++ dups).toDF("id", "text"), "id", "text", k = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.nonEmpty)
    assert((0L until 6L).map(i => (i, i + 1000L)).toSet.subsetOf(streamed))
  }

  test("streaming and batch window aggregation agree") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/in")
    val batch = Events.hourlyByType(spark.read.parquet(s"$dir/in"))
      .orderBy("window_start", "event_type").collect()

    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val q = Events.hourlyByType(streamIn.withWatermark("ts", "2 hours"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("graft_events_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM graft_events_stream")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("packSequences: greedy per-stream packing, not cumulative-floor binning") {
    import spark.implicits._
    def words(n: Int): String = (1 to n).map(i => "w" + i).mkString(" ")
    // stream 0 (capacity 10): sizes 6,6,6 -> greedy bins 0,1,2; the
    // cumulative-floor shortcut would put the third doc in bin 1 with 12
    // tokens (> capacity) - this row is the discriminator. Then an
    // oversized doc (15) gets a bin of its own and the next doc starts
    // fresh. Stream 1: 3,3,3,3 packs 3 per bin.
    val rows = Seq(
      (0L, words(6)), (2L, words(6)), (4L, words(6)), (6L, words(15)), (8L, words(2)),
      (1L, words(3)), (3L, words(3)), (5L, words(3)), (7L, words(3))
    ).toDF("doc_id", "text")
      // null contract: null id -> dropped; null text -> empty (1 ws token)
      .union(spark.sql("SELECT CAST(NULL AS BIGINT), 'orphan text'"))
      .union(spark.sql("SELECT CAST(9 AS BIGINT), CAST(NULL AS STRING)"))
    val got = graft.pipeline.Packing.packSequences(rows, "doc_id", "text",
        capacity = 10L, numStreams = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 10) // the null-id row is gone, the null-text row is not
    assert(got(9L) == ((1L, 1L, 1L))) // null text: 1 token, joins 7's bin 1
    assert(got(0L) == ((0L, 0L, 6L)))
    assert(got(2L) == ((0L, 1L, 6L)))
    assert(got(4L) == ((0L, 2L, 6L)), s"floor-binning would give bin 1: ${got(4L)}")
    assert(got(6L) == ((0L, 3L, 15L))) // oversized: bin of its own
    assert(got(8L) == ((0L, 4L, 2L)))  // fresh bin after the oversized one
    assert(got(1L) == ((1L, 0L, 3L)) && got(3L) == ((1L, 0L, 3L)) && got(5L) == ((1L, 0L, 3L)))
    assert(got(7L) == ((1L, 1L, 3L))) // 3+3+3+3 > 10 -> fourth doc spills
  }

  test("packedBins: assembly agrees with packSequences and joins in doc-id order") {
    import spark.implicits._
    def words(n: Int): String = (1 to n).map(i => "w" + i).mkString(" ")
    val rows = Seq(
      (0L, words(6)), (2L, words(6)), (4L, words(6)), (6L, words(15)), (8L, words(2)),
      (1L, words(3)), (3L, words(3)), (5L, words(3)), (7L, words(3))
    ).toDF("doc_id", "text")
    val bins = graft.pipeline.Packing.packedBins(rows, "doc_id", "text",
        capacity = 10L, numStreams = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // every (stream, bin) from the assignment view appears exactly once
    val assigned = graft.pipeline.Packing.packSequences(rows, "doc_id", "text",
        capacity = 10L, numStreams = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    assert(bins.keySet == assigned.keySet)
    assert(bins((0L, 3L)) == ((1L, 15L, words(15)))) // oversized doc alone
    assert(bins((1L, 0L)) == ((3L, 9L, words(3) + " " + words(3) + " " + words(3))))
    assert(bins((0L, 4L)) == ((1L, 2L, words(2))))
    // n_docs matches the assignment cardinality everywhere
    assert(bins.forall { case (k, (n, _, _)) => assigned(k).size == n })
  }

  test("asofJoin: <= semantics, equal-ts tie rules, per-key state reset") {
    import graft.streaming.Events
    import java.sql.Timestamp
    import spark.implicits._
    def t(s: Long) = new Timestamp(s * 1000L)
    // user 1: views at 10, 20, 20 (ids 100, 101, 102 — equal-ts tie),
    //   purchases at 5 (no prior), 20 (equal ts -> view visible, id 102
    //   wins the tie), 30 (latest view still 20/102)
    // user 2: no views at all -> both purchases null (state must reset)
    // null-key left row must pass through with null asof columns (NOT
    // silently merge with key 0 via encoder default); null-key right row
    // can never match anyone
    val left = Seq((1L, t(5), 200L), (1L, t(20), 201L), (1L, t(30), 202L),
      (2L, t(10), 203L), (2L, t(40), 204L)).toDF("user_id", "ts", "event_id")
      .union(spark.sql("SELECT CAST(NULL AS BIGINT), TIMESTAMP'2024-01-01', CAST(205 AS BIGINT)"))
    val right = Seq((1L, t(10), 100L), (1L, t(20), 101L), (1L, t(20), 102L))
      .toDF("user_id", "ts", "event_id")
      .union(spark.sql("SELECT CAST(NULL AS BIGINT), TIMESTAMP'2020-01-01', CAST(103 AS BIGINT)"))
    val got = Events.asofJoin(left, right, "user_id", "ts", "event_id",
        numPartitions = 2)
      .collect()
      .map(r => r.getLong(1) -> ((Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getTimestamp(4))))).toMap
    assert(got(200L) == ((None, None)))
    assert(got(201L) == ((Some(102L), Some(t(20)))))
    assert(got(202L) == ((Some(102L), Some(t(20)))))
    assert(got(203L) == ((None, None)))
    assert(got(204L) == ((None, None)))
    assert(got(205L) == ((None, None))) // null key: passes through unmatched
    assert(got.size == 6)               // null-key right row matched nothing
  }

  test("streaming packing carries the open bin across micro-batches") {
    import graft.streaming.{PackEvent, StreamPacking}
    import spark.implicits._
    // capacity 10, one stream. batch 1: 6+3 fill bin 0 to 9;
    // batch 2: a 4-token doc must SPILL to bin 1 because the open bin's
    // fill is carried in state; then 5 joins it (9), and 2 spills to bin 2
    val b1 = Seq(PackEvent(0L, 1L, 6L), PackEvent(0L, 2L, 3L))
    val b2 = Seq(PackEvent(0L, 3L, 4L), PackEvent(0L, 4L, 5L), PackEvent(0L, 5L, 2L))
    val dir = java.nio.file.Files.createTempDirectory("graft_spack").toString
    b1.toDS().coalesce(1).write.parquet(s"$dir/in/f1")
    b2.toDS().coalesce(1).write.parquet(s"$dir/in/f2")
    def touch(sub: String, t: Long): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/in/$sub"))
        .forEach(p => p.toFile.setLastModified(t))
    val base = System.currentTimeMillis() - 120000L
    touch("f1", base); touch("f2", base + 60000L)
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*").as[PackEvent]
    val q = StreamPacking.packStream(streamIn, capacity = 10L)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_spack")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT doc_id, bin FROM graft_spack")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("streaming as-of matches across micro-batches via carried state") {
    import graft.streaming.{AsofEvent, StreamAsof}
    import java.sql.Timestamp
    import spark.implicits._
    def t(s: Long) = new Timestamp(s * 1000L)
    // batch 1: view@10 then purchase@20 (matched within the batch);
    // batch 2: purchase@30 must match the view carried in STATE from
    // batch 1, then view@40 + purchase@50 re-match within batch 2
    val b1 = Seq(AsofEvent(1L, t(10), 100L, 0), AsofEvent(1L, t(20), 200L, 1))
    val b2 = Seq(AsofEvent(1L, t(30), 201L, 1),
      AsofEvent(1L, t(40), 101L, 0), AsofEvent(1L, t(50), 202L, 1))
    val dir = java.nio.file.Files.createTempDirectory("graft_sasof").toString
    b1.toDS().coalesce(1).write.parquet(s"$dir/in/f1")
    b2.toDS().coalesce(1).write.parquet(s"$dir/in/f2")
    // FileStreamSource orders pending files by mtime with no tie-break:
    // pin f1 strictly earlier so the two triggers are deterministic even
    // when both writes land in one filesystem-timestamp tick
    def touch(sub: String, t: Long): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/in/$sub"))
        .forEach(p => p.toFile.setLastModified(t))
    val base = System.currentTimeMillis() - 120000L
    touch("f1", base)
    touch("f2", base + 60000L)
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*").as[AsofEvent]
    val q = StreamAsof.asofStream(streamIn)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sasof")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT left_id, asof_id FROM graft_sasof")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(streamed == Map(200L -> Some(100L), 201L -> Some(100L), 202L -> Some(101L)))
  }
}
