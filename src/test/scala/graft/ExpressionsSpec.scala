package graft

import graft.functions.{DedupLines, GraftFunctions, RollingHash64}
import graft.pipeline.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-expr-spec")
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(s)
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pdf_extract SQL expression round-trips pdf and html payloads") {
    import spark.implicits._
    val rows = Seq(
      Corpus.pageRowFor(10L, "sql surface extraction works end to end", "en"),
      Corpus.pageRowFor(11L, "and the html path too of course", "en"))
    rows.toDS().createOrReplaceTempView("expr_pages")
    val out = spark.sql(
      """SELECT url, pdf_extract(html).kind AS kind, pdf_extract(html).text AS text,
        |       pdf_extract(html).decode_failures AS failures
        |FROM expr_pages""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getInt(3))).toMap
    assert(out(Corpus.UrlPrefix + 10) == (("pdf", "sql surface extraction works end to end", 0)))
    assert(out(Corpus.UrlPrefix + 11) == (("html", "and the html path too of course", 0)))
  }

  test("simhash64 SQL matches Dedup.simhash64 and stays in codegen; simhashes() plan has no typed-map conversion") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog every day",
      "a different document with other words entirely present here",
      "tiny") // < 4 words -> signature 0
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    df.createOrReplaceTempView("expr_sim")
    val got = spark.sql("SELECT doc_id, simhash64(text) AS s FROM expr_sim")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == graft.dedup.Dedup.simhash64(t), s"doc $i")
    }
    // codegen evidence on a non-constant-foldable source
    val planDf = spark.range(3).selectExpr("concat('w x y z doc ', id) AS t")
      .selectExpr("simhash64(t) AS s")
    val plan = planDf.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*(") && plan.contains("simhash64"), plan)
    // the Column-based simhashes() path must NOT deserialize rows to objects
    val opPlan = graft.dedup.Dedup.simhashes(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!opPlan.contains("DeserializeToObject") && !opPlan.contains("MapElements"), opPlan)
  }

  test("minhash_bands expression equals the Scala banding fold; banded plan has no typed map") {
    import spark.implicits._
    import graft.dedup.Dedup
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten eleven twelve",
      "too small") // < 3 words -> no bands
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.minhashBands(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      val hs = Dedup.shingleHashes(t, 3)
      if (!hs.hasNext) Nil
      else {
        val sig = Dedup.minhashSignature(hs)
        (0 until Dedup.Bands).map(b => (i.toLong, b, Dedup.bandKey(sig, b)))
      }
    }.toSet
    assert(got == want)
    assert(got.count(_._1 == 2L) == 0) // sub-shingle doc emits nothing
    val plan = Dedup.minhashBands(df, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && plan.contains("minhash_bands"), plan)
  }

  test("pdf_extract rejects non-binary input at analysis time") {
    val e = intercept[Exception](spark.sql("SELECT pdf_extract('not binary')").collect())
    assert(e.getMessage.toLowerCase.contains("binary") || e.getMessage.contains("DATATYPE"))
  }

  test("rolling_hash64 matches the reference implementation and stays in codegen") {
    // spark.range source so the projection is NOT constant-folded into a
    // LocalTableScan — the plan must show a codegen'd stage
    val df = spark.range(3).selectExpr("concat('doc ', id) AS t")
      .selectExpr("t", "rolling_hash64(t) AS h")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 3).map(i => s"doc $i").foreach { s =>
      assert(got(s) == RollingHash64.hash(UTF8String.fromString(s)))
    }
    // the projection must be inside a WholeStageCodegen span (native
    // doGenCode): the '*(n)' prefix marks codegen'd operators
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*(") &&
      plan.contains("rolling_hash64"), plan)
  }

  test("dedup_lines: first-wins order, empty lines kept, trailing empties preserved, codegen'd") {
    def d(s: String): String =
      DedupLines.dedup(UTF8String.fromString(s)).toString
    assert(d("a\nb\na\n\n\nb") == "a\nb\n\n")       // dups dropped, empties kept
    assert(d("single line no newline") == "single line no newline") // fast path
    assert(d("x\nx\nx") == "x")                      // run of dups
    assert(d("") == "")
    assert(d("\n\n") == "\n\n")                      // empties are never dups
    assert(d("a\n") == "a\n")                        // trailing empty survives (split -1)
    // non-constant source so the projection stays a codegen'd stage
    val df = spark.range(3)
      .selectExpr("concat('l', id % 2, chr(10), 'l0', chr(10), 'l', id % 2) AS t")
      .selectExpr("t", "dedup_lines(t) AS out")
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("l0\nl0\nl0") == "l0")
    assert(got("l1\nl0\nl1") == "l1\nl0")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*(") && plan.contains("dedup_lines"), plan)
  }

  test("nfc_normalize: composes combining marks and jamo, keeps ligatures, codegen'd") {
    def n(x: String): String =
      graft.functions.NfcNormalize.normalize(UTF8String.fromString(x)).toString
    assert(n("cafe\u0301") == "caf\u00e9")         // e + combining acute -> e-acute
    assert(n("A\u030A") == "\u00c5")               // A + combining ring
    assert(n("\u1100\u1161") == "\uac00")          // Hangul L+V jamo compose
    assert(n("\uFB01sh") == "\uFB01sh")             // NFC, not NFKC: ligature survives
    assert(n("plain ascii") == "plain ascii")
    assert(n("") == "")
    // already-NFC input returns the SAME UTF8String (no copy)
    val u = UTF8String.fromString("caf\u00e9 already")
    assert(graft.functions.NfcNormalize.normalize(u) eq u)
    // non-constant source (spark.range, like the other expression tests \u2014
    // a local Seq folds into LocalTableScan) so the projection stays a
    // codegen'd stage; the combining mark rides a SQL string literal
    val df = spark.range(3)
      .selectExpr("concat('v', id, '-e\u0301') AS t")
      .selectExpr("t", "nfc_normalize(t) AS out")
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (0 until 3).foreach { i =>
      assert(got(s"v$i-e\u0301") == s"v$i-\u00e9")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*(") && plan.contains("nfc_normalize"), plan)
  }

  test("GraftExtensions wires both function builders") {
    // getOrCreate would reuse the suite session and ignore the extensions
    // config, so apply the injector directly and check the builders.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(GraftFunctions.pdfExtractDesc._3(Seq(Literal(Array[Byte](1))))
      .isInstanceOf[graft.functions.PdfExtractExpr])
    assert(GraftFunctions.rollingHashDesc._3(Seq(Literal("x")))
      .isInstanceOf[graft.functions.RollingHash64Expr])
  }
}
