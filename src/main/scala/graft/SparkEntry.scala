package graft

import graft.ann.Ann
import graft.dedup.Dedup
import graft.functions.TextStats
import graft.multimodal.Multimodal
import graft.pipeline.{Checkpoint, Corpus, ExtractPipeline}
import graft.streaming.Events
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query is ordered on both sides and emits only
  * BIGINT/STRING/TIMESTAMP columns (no engine-computed floats in the
  * hash-compared output). The extraction round-trips are the north_rule's
  * byte-identity gate: the corpus generator constructs PDF/HTML payloads
  * whose reference-semantics extraction equals `documents.text` exactly, so
  * DuckDB can assert byte-identical extraction without parsing a PDF.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def docIdFromUrl: Column =
    element_at(split(col("url"), "/"), -1).cast("long").as("doc_id")

  private def extracted(s: SparkSession, dir: String): DataFrame =
    ExtractPipeline.run(Corpus.pagesCached(s, dir), delimiter = "").toDF()

  /** Flagship: the full mixed PDF+HTML extraction pipeline on sf=0.001. */
  def entry(spark: SparkSession): DataFrame =
    extracted(spark, "/root/testdata/sf0.001")
      .select(col("url"), col("kind"), col("text"), col("pages"),
        col("n_chars"), col("decode_failures"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ extraction pipeline
    "pdf_extract_roundtrip" -> ((s, dir) => {
      extracted(s, dir).where(col("kind") === "pdf")
        .select(docIdFromUrl, col("text"))
        .orderBy("doc_id")
    }),
    "pdf_spans" -> ((s, dir) => {
      // per-span BYTE accuracy gate (round 5): the fixed-layout span probe
      // (Corpus.pdfSpanProbe) pins every content stream's payload to the
      // affine file address 46 + 2225*i, so the oracle can check the
      // actual (start, end, src_offset) values — not just the span COUNT
      // the mixed-pipeline gate hashes
      import s.implicits._
      val pages = docs(s, dir).where(length(col("text")) > 0)
        .select("doc_id", "text", "lang").as[(Long, String, String)]
        .map { case (id, t, lang) => Corpus.spanProbePageRowFor(id, t, lang) }
      // captureLines: src_line (the reference TextStore's 1-based line of
      // the span's source offset) is also closed-form — the probe has
      // exactly 5 newlines per object and 4 before payload 0, and its
      // streams are UNCOMPRESSED, so no pseudorandom 0x0A bytes shift lines
      ExtractPipeline.run(pages, delimiter = "", captureLines = true).toDF()
        .select(docIdFromUrl, posexplode(col("spans")))
        .select(col("doc_id"), col("pos").cast("long").as("span_idx"),
          col("col.start").cast("long").as("start_pos"),
          col("col.end").cast("long").as("end_pos"),
          col("col.src_offset").cast("long").as("src_offset"),
          col("col.src_line").cast("long").as("src_line"))
        .orderBy("doc_id", "span_idx")
    }),
    "html_spans" -> ((s, dir) => {
      // HTML-path twin of pdf_spans: the fixed-layout probe
      // (Corpus.htmlSpanProbe — one <p> per 20-word block, no escaping, no
      // chrome) makes every span's [start,end), source char offset
      // (69 + 8i + cumlen) and source line (3 + i) a closed form of the
      // word array. Docs whose text contains & < > are excluded on BOTH
      // sides (the probe writes raw text nodes), as are lone <=16-word
      // blocks (NumWordsRules drops them; the oracle replicates the rule)
      import s.implicits._
      val pages = docs(s, dir)
        .where(length(trim(col("text"))) > 0 && !col("text").rlike("[&<>]"))
        .select("doc_id", "text", "lang").as[(Long, String, String)]
        .map { case (id, t, lang) => Corpus.htmlSpanProbePageRowFor(id, t, lang) }
      ExtractPipeline.run(pages, delimiter = "", captureLines = true).toDF()
        .select(docIdFromUrl, posexplode(col("spans")))
        .select(col("doc_id"), col("pos").cast("long").as("span_idx"),
          col("col.start").cast("long").as("start_pos"),
          col("col.end").cast("long").as("end_pos"),
          col("col.src_offset").cast("long").as("src_offset"),
          col("col.src_line").cast("long").as("src_line"),
          col("col.kind").as("kind"))
        .orderBy("doc_id", "span_idx")
    }),
    "html_extract_roundtrip" -> ((s, dir) => {
      extracted(s, dir).where(col("kind") === "html")
        .select(docIdFromUrl, col("title"), col("text"))
        .orderBy("doc_id")
    }),
    "crawl_delta" -> ((s, dir) => {
      // recrawl snapshot reconciliation (Recrawl.delta — the monthly-
      // recrawl work-list shrinker): prev = every doc; next drops ids%7==0
      // (removed), rewrites the payload on the surviving ids%5==0
      // (changed), keeps the rest byte-identical, and adds new-<id> urls
      // for ids%3==0 — every status a closed form of doc_id
      val d = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val url = concat(lit(Corpus.UrlPrefix), col("doc_id"))
      val prev = d.select(url.as("url"), md5(col("text").cast("binary")).as("fp"))
      val nextOld = d.where(col("doc_id") % 7 =!= 0).select(
        url.as("url"),
        md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit("x")))
          .otherwise(col("text")).cast("binary")).as("fp"))
      val added = d.where(col("doc_id") % 3 === 0).select(
        concat(lit(Corpus.UrlPrefix), lit("new-"), col("doc_id")).as("url"),
        md5(concat(lit("n"), col("doc_id")).cast("binary")).as("fp"))
      graft.pipeline.Recrawl.delta(prev, nextOld.unionByName(added), "url", "fp")
        .orderBy("url")
    }),
    "html_charset_roundtrip" -> ((s, dir) => {
      // charset transport: the SAME payload in UTF-8+BOM / windows-1252
      // meta / ISO-8859-1 http-equiv / UTF-16LE+BOM (by doc_id%4) must
      // extract byte-identically — the marker words are non-ASCII, so a
      // wrong decode cannot accidentally match the oracle
      import s.implicits._
      docs(s, dir).select("doc_id", "text").as[(Long, String)]
        .map { case (id, t) =>
          val decoded = graft.html.Boilerplate.decode(Corpus.htmlCharsetProbe(id, t))
          (id, graft.html.Boilerplate.extract(decoded).text)
        }.toDF("doc_id", "text")
        .orderBy("doc_id")
    }),
    "html_layout_roundtrip" -> ((s, dir) => {
      // layout surface: lists render with "- " markers, table-row cells join
      // with " | " — the corpus distributes each doc's words over a fixed
      // p/ul/table structure so the expected text is a word-slicing
      // expression DuckDB can compute (see Corpus.htmlLayoutFromText)
      import s.implicits._
      val pages = docs(s, dir).select("doc_id", "text", "lang")
        .as[(Long, String, String)]
        .map { case (id, t, lang) => Corpus.layoutPageRowFor(id, t, lang) }
      ExtractPipeline.run(pages, delimiter = "").toDF()
        .select(docIdFromUrl, col("text"))
        .orderBy("doc_id")
    }),
    "pdf_extract_delim_roundtrip" -> ((s, dir) => {
      // the reference's DEFAULT ContentDelimiter "|" (PdfParser.cs:83):
      // every show-op appends decoded+"|", reconstructable in SQL as
      // 64-char re-chunking of the source text
      ExtractPipeline.run(Corpus.pagesCached(s, dir), delimiter = "|").toDF()
        .where(col("kind") === "pdf")
        .select(docIdFromUrl, col("text"))
        .orderBy("doc_id")
    }),
    "extract_pipeline_mixed" -> ((s, dir) => {
      extracted(s, dir)
        .select(docIdFromUrl, col("kind"),
          col("n_chars").cast("long").as("n_chars"),
          col("pages").cast("long").as("pages"),
          size(col("spans")).cast("long").as("n_spans"),
          col("decode_failures").cast("long").as("failures"))
        .orderBy("doc_id")
    }),
    "extract_metrics_by_lang" -> ((s, dir) => {
      extracted(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("total_chars"),
          sum(col("decode_failures").cast("long")).as("total_failures"))
        .orderBy("lang")
    }),
    "extract_metrics_fast" -> ((s, dir) =>
      // the metrics-only path (runMetrics: captureText=false, narrow row) —
      // gated independently of the full-text path so the two can never
      // silently diverge
      ExtractPipeline.runMetrics(Corpus.pagesCached(s, dir)).toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("total_chars"),
          sum(col("pages").cast("long")).as("total_pages"),
          sum(col("decode_failures").cast("long")).as("total_failures"))
        .orderBy("kind")),
    "resume_after_checkpoint" -> ((s, dir) => {
      import org.apache.spark.sql.SaveMode
      val pages = Corpus.pagesCached(s, dir)
      val outDir = s"${sys.props("java.io.tmpdir")}/graft_ckpt_${Integer.toHexString(dir.hashCode)}"
      // reset any previous manifest so the query is idempotent
      val p = new org.apache.hadoop.fs.Path(Checkpoint.manifestPath(outDir))
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // first run "completed" every doc_id % 7 == 0
      val firstBatch = ExtractPipeline.run(
        pages.where(element_at(split(col("url"), "/"), -1).cast("long") % 7 === 0),
        delimiter = "")
      Checkpoint.commit(firstBatch, outDir)
      // resume: left-anti join against the manifest, extract the remainder
      val remaining = Checkpoint.resume(pages, outDir)
      ExtractPipeline.run(remaining, delimiter = "").toDF()
        .select(docIdFromUrl, col("n_chars").cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),
    "compact_checkpoint" -> ((s, dir) => {
      // small-file maintenance: three separate commits compacted into ONE
      // batch; the oracle asserts content identity after the rewrite (the
      // batch-count / resume-to-zero structure is unit-pinned)
      val pages = Corpus.pagesCached(s, dir)
      val outDir = s"${sys.props("java.io.tmpdir")}/graft_compact_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(outDir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docId = element_at(split(col("url"), "/"), -1).cast("long")
      (0 until 3).foreach { r =>
        Checkpoint.commitWithData(
          ExtractPipeline.run(pages.where(docId % 3 === r), delimiter = ""),
          outDir)
      }
      Checkpoint.compact(s, outDir)
      Checkpoint.readExtracted(s, outDir)
        .select(docIdFromUrl, col("n_chars").cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),
    // --------------------------------------------------------------- dedup
    "dedup_exact" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionAll(
        d.where(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      Dedup.exactGroups(corpus, "doc_id", "text").orderBy("fp")
    }),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", k = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashDedupPairs(docs(s, dir), "doc_id", "text", k = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")),
    "dedup_minhash_stream_parity" -> ((s, dir) =>
      // the STREAMING banding transform (StreamMinhash.bandedStream) run in
      // batch + exact verify: driver-gate evidence for the streaming code
      // path — same banding fold a readStream pipeline executes, same
      // exact-Jaccard oracle as dedup_minhash_lsh
      graft.streaming.StreamMinhash.batchParityPairs(docs(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")),
    "dedup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", k = 3, threshold = 0.8))
        .orderBy("doc_id")),
    "dedup_simhash" -> ((s, dir) => {
      // SimHash Hamming-band near-dup pairs, restricted to pairs whose
      // CASE-SENSITIVE whitespace-normalized text is identical so DuckDB
      // can oracle it exactly: equal normalized text ⇒ identical word
      // sequence (simhash64 is case-sensitive, so the fingerprint must be
      // too — a lowercased fp would admit case-variant pairs with nonzero
      // Hamming) ⇒ identical simhash ⇒ Hamming 0, and the pigeonhole
      // banding surfaces every Hamming≤3 pair. Docs under 4 words are
      // excluded on both sides (their simhash degenerates to 0, making all
      // of them mutually Hamming-0 — a degenerate bucket the cap may drop).
      // The unrestricted Hamming-1..3 behavior is covered by DedupSpec's
      // brute-force comparison (not ANSI-SQL-expressible).
      val d = docs(s, dir).select("doc_id", "text")
        .where(TextStats.wsTokens(col("text")) >= 4)
      val corpus = d.unionAll(
        d.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      val fp = corpus.select(col("doc_id"),
        md5(regexp_replace(trim(col("text")), "\\s+", " ").cast("binary")).as("fp"))
      Dedup.simhashPairs(Dedup.simhashes(corpus, "doc_id", "text"), maxDist = 3)
        .join(fp.as("fa"), col("id_a") === col("fa.doc_id"))
        .join(fp.as("fb"), col("id_b") === col("fb.doc_id"))
        .where(col("fa.fp") === col("fb.fp"))
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),
    "dedup_embedding_cosine" -> ((s, dir) => {
      val e = embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.unionAll(
        e.where(col("id") % 10 === 0).select((col("id") + 100000L).as("id"), col("embedding")))
      Ann.cosineDupPairsIvf(corpus, threshold = 0.95).orderBy("id_a", "id_b")
    }),
    "dedup_embedding_rplsh" -> ((s, dir) => {
      // random-hyperplane LSH band candidates + exact cosine verify — the
      // quantizer-free scale path; same corpus and threshold as the IVF
      // variant, so the exact-verified output is identical
      val e = embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.unionAll(
        e.where(col("id") % 10 === 0).select((col("id") + 100000L).as("id"), col("embedding")))
      Ann.rplshCosineDupPairs(corpus, threshold = 0.95).orderBy("id_a", "id_b")
    }),
    "dedup_embedding_rplsh_mp" -> ((s, dir) => {
      // multi-probe RP-LSH (distance-1 bucket probing) on the same
      // planted-copy corpus: exact copies match every band, so the
      // exact-verified output is identical to the single-probe gate's —
      // the recall edge the probing buys is pinned in AnnSpec
      val e = embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.unionAll(
        e.where(col("id") % 10 === 0).select((col("id") + 100000L).as("id"), col("embedding")))
      Ann.rplshCosineDupPairsMultiProbe(corpus, threshold = 0.95)
        .orderBy("id_a", "id_b")
    }),
    "dedup_chunks" -> ((s, dir) => {
      // paragraph-style exact chunk dedup (20-word windows) with planted
      // exact copies so duplicated windows exist deterministically
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionAll(
        d.where(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
      Dedup.duplicateChunks(corpus, "doc_id", "text").orderBy("fp")
    }),
    "pack_sequences" -> ((s, dir) =>
      // greedy fixed-capacity sequence packing (pretraining batch
      // construction) over 16 independent streams; the sequential
      // recurrence runs per-stream inside one sorted mapPartitions pass
      graft.pipeline.Packing.packSequences(
        docs(s, dir).select("doc_id", "text"), "doc_id", "text")
        .orderBy("doc_id")),
    "chunk_windows" -> ((s, dir) =>
      // sliding-token-window chunking with overlap (embedding/retrieval
      // index preparation — packSequences' sibling: SPLIT documents into
      // overlapping windows instead of packing them into budgets); pure
      // codegen'd split/sequence/explode/slice, zero shuffles
      graft.functions.Chunking.chunkWindows(
        docs(s, dir), "doc_id", "text", windowTokens = 40, overlapTokens = 10)
        .orderBy("doc_id", "chunk_idx")),
    "pack_sequences_stream_parity" -> ((s, dir) => {
      // the STREAMING packing transform (stateful flatMapGroupsWithState)
      // run in batch: must reproduce packSequences row-for-row against the
      // identical recursive-CTE oracle
      import s.implicits._
      val typed = docs(s, dir)
        .where(col("doc_id").isNotNull)
        .select((col("doc_id") % 16).as("stream"), col("doc_id"),
          graft.functions.TextStats.wsTokens(coalesce(col("text"), lit("")))
            .as("n_tokens"))
        .as[graft.streaming.PackEvent]
      graft.streaming.StreamPacking.packStream(typed)
        .toDF("doc_id", "stream", "bin", "n_tokens")
        .orderBy("doc_id")
    }),
    "pack_bins" -> ((s, dir) =>
      // trainer-ready assembly: completed bins emitted from the SAME
      // single sorted pass (no second shuffle); fingerprint the packed
      // text so the oracle checks byte-identical member order and joins
      graft.pipeline.Packing.packedBins(
        docs(s, dir).select("doc_id", "text"), "doc_id", "text")
        .select(col("stream"), col("bin"), col("n_docs"), col("tot_tokens"),
          md5(col("text").cast("binary")).as("packed_fp"),
          length(col("text")).cast("long").as("packed_len"))
        .orderBy("stream", "bin")),
    "dedup_exact_spans" -> ((s, dir) => {
      // Lee-et-al-style exact-substring span dedup: chimera docs (text
      // self-concatenated) plant long duplicated spans; windows crossing
      // the chimera seam occur once, so the island merge must SPLIT there
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionAll(
        d.where(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 7000000L).as("doc_id"),
            concat(col("text"), lit(" "), col("text")).as("text")))
      Dedup.duplicateSpans(corpus, "doc_id", "text", windowTokens = 20)
        .orderBy("doc_id", "start_pos")
    }),
    "dedup_drop_common_chunks" -> ((s, dir) =>
      // C4-style boilerplate removal: drop every 5-word window occurring in
      // >= 3 distinct documents, reassemble the survivors in order (docs
      // reduced to nothing stay as empty rows)
      Dedup.dropCommonChunks(docs(s, dir).select("doc_id", "text"),
        "doc_id", "text").orderBy("doc_id")),
    "dedup_keep_best" -> ((s, dir) =>
      // canonical-URL dedup keeping the BEST fetch per page: key = the
      // canonicalized form of a deterministically-synthesized messy URL
      // (35 groups), score = text length, kept_id = argmax score with
      // min-id tie-break — one map-side-combined aggregation, no window
      Dedup.keepBestPerKey(
          docs(s, dir).select(col("doc_id"),
            graft.functions.Urls.canonicalUrl(concat(
              lit("HTTPS://Example"), col("doc_id") % 7,
              lit(".COM:443/p"), col("doc_id") % 5,
              lit("?utm_source=a&gclid=z#frag"))).as("curl"),
            TextStats.nChars(col("text")).as("score")),
          "curl", "doc_id", "score")
        .orderBy("key")),
    "text_repetition" -> ((s, dir) =>
      TextStats.repetitionSignals(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    "embedding_quantize" -> ((s, dir) =>
      Ann.quantizeInt8(embeddings(s, dir).select(col("vec_id").as("id"), col("embedding")))
        .orderBy("id", "pos")),
    // ----------------------------------------------------- similarity search
    "ann_topk_bruteforce" -> ((s, dir) => {
      val e = embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      Ann.bruteForceTopK(e, e.where(col("id") < 10), k = 5)
        .orderBy("query_id", "rank")
    }),
    "ann_ivf" -> ((s, dir) => {
      val e = embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      Ann.ivfTopK(e, e.where(col("id") < 10), e.where(col("id") % 50 === 0),
          nprobe = 3, k = 5)
        .orderBy("query_id", "rank")
    }),
    "ann_quantized_rerank" -> ((s, dir) => {
      // SQ8 search: integer-exact coarse top-25 over int8-quantized vectors,
      // exact-cosine re-rank to top-5 — the compressed-index scale path
      val e = embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      Ann.quantizedRerankTopK(e, e.where(col("id") < 10), k = 5, pool = 25)
        .orderBy("query_id", "rank")
    }),
    // --------------------------------------------------------- text analysis
    "text_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextStats.wsTokens(col("text")).as("ws_tokens"),
          TextStats.regexTokens(col("text")).as("re_tokens"))
        .orderBy("doc_id")),
    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextStats.nChars(col("text")).as("n_chars"),
          TextStats.wsTokens(col("text")).as("n_words"),
          TextStats.nAlpha(col("text")).as("n_alpha"),
          TextStats.nStopwords(col("text")).as("n_stop"))
        .orderBy("doc_id")),
    "text_quality_filter" -> ((s, dir) =>
      docs(s, dir)
        .where(TextStats.qualityKeep(col("text"), wordMin = 15))
        .select(col("doc_id"), TextStats.wsTokens(col("text")).as("n_words"))
        .orderBy("doc_id")),
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextStats.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),
    "pii_scrub" -> ((s, dir) => {
      // deterministic PII augmentation (doc_id mod 3/5/7 gets an email /
      // dotted quad / phone) so both match and no-match paths are gated;
      // counts follow the chain's intermediates (see Pii scaladoc)
      import graft.functions.Pii
      val aug = docs(s, dir).select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com now")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit(" from 10."),
          (col("doc_id") % 200).cast("string"), lit(".3.4")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, concat(lit(" call +1 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0")))
          .otherwise(lit(""))).as("text"))
      aug.select(col("doc_id"),
          Pii.nEmails(col("text")).as("n_emails"),
          Pii.nIpv4(col("text")).as("n_ips"),
          Pii.nPhones(col("text")).as("n_phones"),
          md5(Pii.scrub(col("text")).cast("binary")).as("redacted_fp"),
          length(Pii.scrub(col("text"))).cast("long").as("redacted_len"))
        .orderBy("doc_id")
    }),
    "text_gopher" -> ((s, dir) => {
      // full Gopher rule set over deterministically-augmented text: doc_id
      // mod 4/5/7 plants bullet lines, an ellipsis line + hashes, and a
      // run of non-alphabetic words, so every rule's fail path is gated
      val aug = docs(s, dir).select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 4 === 0,
          lit("\n- bullet line\n- another bullet")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit("\nto be continued...\n# # #")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" "), repeat(lit("9 "), 10))).otherwise(lit(""))
      ).as("text"))
      aug.select(col("doc_id"),
          graft.functions.TextStats.gopherSignals(col("text"), minWords = 15).as("g"))
        .select(col("doc_id"), col("g.*"))
        .orderBy("doc_id")
    }),
    "text_langid" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextStats.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")),
    "text_rollinghash" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      docs(s, dir).select(col("doc_id"),
          expr("rolling_hash64(text)").as("rhash"))
        .orderBy("doc_id")
    }),
    "pdf_metadata" -> ((s, dir) => {
      // document-level metadata surface (version sniff, trailer /Info merge,
      // page-tree count, /Metadata XML, trailer /ID) — S2/S7/S15/S24
      import s.implicits._
      Corpus.pagesCached(s, dir)
        .filter(p => Corpus.isPdfDoc(p.url.substring(Corpus.UrlPrefix.length).toLong))
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { p =>
            val r = graft.pdf.PdfExtract.extract(p.html, buffers = buffers, captureFragments = false)
            (p.url.substring(Corpus.UrlPrefix.length).toLong,
              r.pdfVersion.getOrElse(""), r.documentInfo.getOrElse(""), r.pages.toLong,
              r.metadata.getOrElse(""), r.documentId.getOrElse(""))
          }
        }.toDF("doc_id", "pdf_version", "info", "n_pages", "metadata", "document_id")
        .orderBy("doc_id")
    }),
    "pdf_extract_extended" -> ((s, dir) => {
      // the opt-in extended filter surface (LZW / ASCIIHex / ASCII85 /
      // ASCII85+Flate chain) — extraction with extendedFilters = true over
      // payloads the DEFAULT reference mode refuses (it supports only None
      // and FlateDecode); same chunk contract as variant 0, so the oracle
      // is the raw text
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfExtendedForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false,
              extendedFilters = true)
            (id, r.text, r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "text", "failures")
        .orderBy("doc_id")
    }),
    "pdf_extract_predictors" -> ((s, dir) => {
      // the opt-in full predictor surface (PNG per-row None/Sub/Up/Average/
      // Paeth under Predictor 15, TIFF Predictor 2, Predictor 1) — variant-4
      // xref-STREAM docs whose cross-reference rows the DEFAULT reference
      // mode refuses (Token.cs:652-668 accepts only Predictor 12 + all-Up
      // rows); the page graph lives behind that xref stream, so a predictor
      // bug loses the whole document, and the chunk contract is variant 4's
      // (plain text), so the oracle is the raw text
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfPredictorForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false,
              extendedFilters = true)
            (id, r.text, r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "text", "failures")
        .orderBy("doc_id")
    }),
    "pdf_extract_hybrid_xref" -> ((s, dir) => {
      // HYBRID-reference files (ISO 32000-1 §7.5.8.4): the classic table
      // hides the whole page graph behind free entries; only the trailer's
      // /XRefStm supplement (followed under extendedFilters) can resolve
      // the catalog, so a resurrect bug loses every document here. Same
      // chunk contract as variant 0 -> the oracle is the raw text. Default
      // mode keeps the reference's ignore-the-key error surface
      // (unit-pinned in PdfExtractSpec).
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfHybridForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false,
              extendedFilters = true)
            (id, r.text, r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "text", "failures")
        .orderBy("doc_id")
    }),
    "pdf_extract_extended_aes" -> ((s, dir) => {
      // REAL AES-128-CBC decryption (V4/R4 AESV2 crypt filter) under the
      // opt-in extended mode — the one beyond-reference PDF capability that
      // previously had only fixture tests; same chunk contract as variant 0,
      // so the oracle is the raw text (reference throw surface for V>2:
      // Tokeniser.cs:635-645 — default mode replicates it, unit-tested)
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfAesForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false,
              extendedFilters = true)
            (id, r.text, r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "text", "failures")
        .orderBy("doc_id")
    }),
    "text_dedup_lines" -> ((s, dir) => {
      // within-document duplicate-line removal (RefinedWeb-style
      // preprocessing) as the native codegen'd `dedup_lines` expression —
      // a pure per-row rewrite, ZERO shuffles at any corpus size. Both
      // engines build the same multi-line input from `text` (planted
      // duplicate lines + empty lines, plus a prefix line that collapses
      // into a duplicate when the text is short), so first-wins order,
      // empty-line preservation and the trailing-empty split contract are
      // all gate-visible
      graft.functions.GraftFunctions.register(s)
      s.read.parquet(s"$dir/documents.parquet")
        .where("doc_id % 2 = 0")
        .selectExpr(
          "doc_id",
          """dedup_lines(concat(text, chr(10), 'dup-line', chr(10), substr(text, 1, 20),
            |  chr(10), 'dup-line', chr(10), chr(10), 'dup-line', chr(10), chr(10), text)) AS text"""
            .stripMargin)
        .orderBy("doc_id")
    }),
    "warc_roundtrip" -> ((s, dir) => {
      // the WARC source (ISO 28500 — the on-disk format upstream of the
      // page table): per document a 3-record crawl file (warcinfo/request/
      // response, gzip-per-record member layout on even doc_ids) is parsed
      // streaming; only the response's HTTP body may surface, headers
      // stripped, URL/date/record counts all closed forms of doc_id
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, t) =>
            val recs = graft.sources.Warc.records(
              new java.io.ByteArrayInputStream(Corpus.warcForDoc(id, t))).toVector
            val nErrors = recs.count(_.isLeft).toLong
            val good = recs.collect { case Right(r) => r }
            val resp = good.filter(_.warcType == "response")
            val (url, date, body) = resp.headOption.map { r =>
              val (_, b) = graft.sources.Warc.httpSplit(r.payload)
              (r.targetUri, r.date,
                new String(b, java.nio.charset.StandardCharsets.UTF_8))
            }.getOrElse(("", "", ""))
            (id, good.size.toLong, nErrors, url, date, body)
          }
        }.toDF("doc_id", "n_records", "n_errors", "url", "warc_date", "text")
        .orderBy("doc_id")
    }),
    "wet_roundtrip" -> ((s, dir) => {
      // the WET sidecar format (Common Crawl's pre-extracted text): only
      // the conversion record's UTF-8 payload may surface — the warcinfo
      // and the planted DECOY response (an HTTP body masquerading as text)
      // must be skipped; url/date/text closed forms of doc_id, gzip-member
      // transport on ids%3==0
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, t) =>
            val recs = graft.sources.Warc.records(
              new java.io.ByteArrayInputStream(Corpus.wetForDoc(id, t))).toVector
            val conv = recs.collect {
              case Right(r) if r.warcType == "conversion" => r
            }
            val (url, date, text) = conv.headOption.map { r =>
              (r.targetUri, r.date,
                new String(r.payload, java.nio.charset.StandardCharsets.UTF_8))
            }.getOrElse(("", "", ""))
            (id, recs.count(_.isRight).toLong, conv.size.toLong, url, date, text)
          }
        }.toDF("doc_id", "n_records", "n_conversion", "url", "wet_date", "text")
        .orderBy("doc_id")
    }),
    "sitemap_entries" -> ((s, dir) => {
      // sitemaps.org protocol (the crawl-seeding artifact robots.txt points
      // at): per document a synthetic urlset (even ids, entity-escaped
      // query strings + lastmod arms) or sitemapindex (odd ids), gzip
      // transport on ids%3==0, namespace prefixes on ids%4==0 — every
      // entry a closed form of (doc_id, idx)
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long]
        .flatMap { id =>
          val p = graft.sources.Sitemap.parse(Corpus.sitemapForDoc(id))
            .fold(e => throw new IllegalStateException(e), identity)
          p.entries.zipWithIndex.map { case (e, i) =>
            (id, i.toLong, p.isIndex, e.loc, e.lastmod.orNull)
          }
        }.toDF("doc_id", "idx", "is_index", "loc", "lastmod")
        .orderBy("doc_id", "idx")
    }),
    "feed_items" -> ((s, dir) => {
      // RSS/Atom feed parsing (the third crawl-discovery artifact —
      // news-style pipelines seed frontiers from feeds): per document a
      // synthetic RSS 2.0 (even ids) or Atom 1.0 (odd ids) feed — CDATA
      // titles literal, entity-decoded plain titles/hrefs, Atom rel
      // selection past self-link decoys, pubDate vs published/updated
      // fallback, a linkless entry that must vanish; namespace prefixes on
      // odd%5==1, gzip on %3==0 — every field a closed form of (doc_id, idx)
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long]
        .flatMap { id =>
          val p = graft.sources.Feed.parse(Corpus.feedForDoc(id))
            .fold(e => throw new IllegalStateException(e), identity)
          p.items.zipWithIndex.map { case (it, i) =>
            (id, i.toLong, p.kind, it.link, it.title.orNull, it.published.orNull)
          }
        }.toDF("doc_id", "idx", "kind", "link", "title", "published")
        .orderBy("doc_id", "idx")
    }),
    "robots_allow" -> ((s, dir) => {
      // RFC 9309 robots.txt policy (the fetch-side keepability gate, twin
      // of html_meta's robots directives): per document a synthetic policy
      // file — specific graftbot group on EVEN ids only, so
      // group-selection-vs-* is visible — evaluated against 5 probe paths;
      // wildcard + $-anchor matching, longest-match-wins and the
      // crawl-delay/sitemap surfaces are all closed forms of (doc_id, arm)
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long]
        .flatMap { id =>
          val policy = graft.sources.Robots.parse(Corpus.robotsForDoc(id), "graftbot")
          (0 until 5).map { arm =>
            (id, arm.toLong, policy.isAllowed(Corpus.robotsPathArm(id, arm)),
              policy.crawlDelaySec.map(_.toLong),
              policy.sitemaps.headOption.getOrElse(""))
          }
        }.toDF("doc_id", "arm", "allowed", "crawl_delay", "sitemap")
        .orderBy("doc_id", "arm")
    }),
    "text_normalize" -> ((s, dir) => {
      // Unicode NFC normalization (UAX #15) as the native codegen'd
      // nfc_normalize expression — the CCNet-style cleanup stage before
      // any fingerprinting: byte-distinct spellings of the same text must
      // hash identically downstream. Both engines prepend the same
      // combining-mark-rich prefix (combining acute/diaeresis/ring that
      // must COMPOSE, Hangul L+V jamo that must compose algorithmically,
      // and an fi-ligature U+FB01 that must SURVIVE — NFC, not NFKC), so
      // composition, the codepoint delta and the already-normalized
      // passthrough are all gate-visible
      graft.functions.GraftFunctions.register(s)
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          concat(lit("cafe\u0301 nai\u0308ve A\u030A \u1100\u1161 \uFB01sh "),
            col("text")).as("raw"))
        .selectExpr("doc_id", "nfc_normalize(raw) AS text",
          "CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT) AS n_composed")
        .orderBy("doc_id")
    }),
    "dedup_corpus_lines" -> ((s, dir) => {
      // CCNet-style CORPUS-WIDE line dedup (the cross-document complement
      // of text_dedup_lines): both engines build the same 5-line input —
      // a boilerplate line shared by every doc_id%7 class (cross-doc dup,
      // planted twice so the within-doc repeat is also gate-visible), a
      // unique content line, an empty line (always kept), and a second
      // shared line keyed by doc_id%5 — so the corpus-wide
      // first-occurrence-wins contract, empty-line preservation and
      // whole-doc reassembly are all oracle-checked
      s.read.parquet(s"$dir/documents.parquet")
        .selectExpr("doc_id",
          """concat('shared-', doc_id % 7, chr(10), md5(text), chr(10),
            |  'shared-', doc_id % 7, chr(10), chr(10), 'tail-', doc_id % 5) AS text"""
            .stripMargin)
        .transform(d => graft.dedup.Dedup.dedupLinesAcrossCorpus(d, "doc_id", "text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "html_anchor_text" -> ((s, dir) => {
      // anchor-text extraction: the same edge walk as html_links, each
      // edge keyed to its element's inner text — pins every innerText
      // convention on closed forms (mid-word entity, transparent inline
      // tag, <br> separator, comment skip, whitespace collapse, image-only
      // empty anchor, HTML5 nested-<a> auto-close, javascript:-text and
      // href-less-target suppression); probe at Corpus.htmlAnchorProbe
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, t) =>
          graft.html.Links.extractAnchors(Corpus.htmlAnchorProbe(id, t), Corpus.UrlPrefix + id)
            .zipWithIndex.map { case ((href, anchor), ord) => (id, ord.toLong, href, anchor) }
        }.toDF("doc_id", "ord", "href", "anchor")
        .orderBy("doc_id", "ord")
    }),
    "anchor_profile" -> ((s, dir) => {
      // per-target anchor profile (Anchors.profile): in-link count,
      // distinct-anchor count and most-frequent anchor per target over the
      // whole corpus's htmlAnchorProbe edges — the shared hub targets give
      // the argmax real cross-document frequency structure (the empty
      // image-anchor ties ords 0 and 2 onto one hub target; the three
      // "bold-K tail" variants contend on the example.org targets)
      import s.implicits._
      val edges = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, t) =>
          graft.html.Links.extractAnchors(Corpus.htmlAnchorProbe(id, t), Corpus.UrlPrefix + id)
        }.toDF("dst", "anchor")
      graft.html.Anchors.profile(edges, "dst", "anchor")
        .orderBy("dst")
    }),
    "html_jsonld" -> ((s, dir) => {
      // schema.org JSON-LD extraction (StructuredData.jsonLd): raw blocks
      // found by the hardened scanner, PARSED by Spark's own
      // get_json_object (the Spark-first division of labor — no hand-rolled
      // JSON parser); type-attr quoting/case/parameter arms rotate by
      // doc_id, decoys (javascript-typed, type-less, commented-out) vanish
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, t) =>
          graft.html.StructuredData.jsonLd(Corpus.htmlJsonLdProbe(id, t))
            .zipWithIndex.map { case (j, i) => (id, i.toLong, j) }
        }.toDF("doc_id", "idx", "json")
        .select(col("doc_id"), col("idx"), col("json"),
          get_json_object(col("json"), "$.headline").as("headline"),
          get_json_object(col("json"), "$.datePublished").as("published"))
        .orderBy("doc_id", "idx")
    }),
    "html_outline" -> ((s, dir) => {
      // heading outline (Outline.headings — the HTML twin of pdf_outline):
      // three body headings whose levels/titles are closed forms of doc_id
      // (named entity, transparent inline tag, numeric character
      // reference), with chrome / commented-out / forged-in-script heading
      // decoys that must vanish; probe at Corpus.htmlOutlineProbe
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, t) =>
          graft.html.Outline.headings(Corpus.htmlOutlineProbe(id, t))
            .zipWithIndex.map { case ((lvl, title), i) => (id, i.toLong, lvl.toLong, title) }
        }.toDF("doc_id", "idx", "level", "title")
        .orderBy("doc_id", "idx")
    }),
    "html_tables" -> ((s, dir) => {
      // structured table-cell extraction (Tables.cells): header/data cells,
      // an EMPTY structural cell, implied </td>/</tr> closes, a NESTED
      // table whose containing cell pauses around it, a <tr>-less implied
      // row, and forged-in-script / commented-out decoys; probe at
      // Corpus.htmlTableProbe, every cell a closed form of doc_id
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, t) =>
          graft.html.Tables.cells(Corpus.htmlTableProbe(id, t))
            .map(c => (id, c.tableIdx.toLong, c.rowIdx.toLong, c.colIdx.toLong,
              c.header, c.text))
        }.toDF("doc_id", "table_idx", "row_idx", "col_idx", "is_header", "cell")
        .orderBy("doc_id", "table_idx", "row_idx", "col_idx")
    }),
    "html_links" -> ((s, dir) => {
      // out-link extraction (ADDITIVE surface — the edges of the web graph
      // that feed URL frontiers and link-based quality priors): five kept
      // anchors rotate every href form (absolute / path-relative /
      // root-relative / protocol-relative / dot-dot+fragment), four
      // non-links must vanish (javascript:, mailto:, commented-out,
      // script-forged), and odd doc_ids add a first-wins <base> that
      // rebases the relative arms; every resolved URL a closed form
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, t) =>
          graft.html.Links.extract(Corpus.htmlLinksProbe(id, t), Corpus.UrlPrefix + id)
            .zipWithIndex.map { case (href, ord) => (id, ord.toLong, href) }
        }.toDF("doc_id", "ord", "href")
        .orderBy("doc_id", "ord")
    }),
    "link_pagerank" -> ((s, dir) => {
      // link-graph quality prior: EXACT INTEGER PageRank (8 rounds, d=85,
      // scale 10^12 — floor-div recurrence, so the distributed sum is
      // bit-reproducible on any partitioning and the oracle can restate
      // the fixpoint exactly) over a synthetic functional graph whose
      // three out-edges per doc are closed forms of doc_id mod N; N rides
      // a 1-row broadcast cross join, never a driver-side count
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val withN = docs.select("doc_id")
        .crossJoin(docs.agg(count(lit(1)).as("n")))
      val edges = withN.selectExpr("doc_id AS src", "(doc_id*31+7) % n AS dst")
        .unionByName(withN.selectExpr("doc_id AS src", "(doc_id*17+3) % n AS dst"))
        .unionByName(withN.selectExpr("doc_id AS src", "(doc_id+1) % n AS dst"))
      graft.graph.PageRank.run(edges, "src", "dst", iterations = 8)
        .withColumnRenamed("v", "doc_id")
        .orderBy("doc_id")
    }),
    "html_meta" -> ((s, dir) => {
      // head-metadata extraction (ADDITIVE surface): canonical link (the
      // strongest dedup key a page can carry), meta/og descriptions, and
      // robots noindex/nofollow — quoted/unquoted/swapped-order attribute
      // forms and a forged meta inside a <script> string are all
      // gate-visible; every value is a closed form of (doc_id, len)
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 1)
        .map { case (id, t) =>
          val m = graft.html.Meta.extract(Corpus.htmlMetaProbe(id, t))
          (id, m.canonical, m.description, m.ogTitle, m.ogDescription, m.noindex, m.nofollow)
        }
        .toDF("doc_id", "canonical", "description", "og_title", "og_description", "noindex", "nofollow")
        .orderBy("doc_id")
    }),
    "pdf_annotations" -> ((s, dir) => {
      // per-page annotation extraction (ADDITIVE surface — annotation text
      // IS document text, Link URIs feed the URL graph): FreeText
      // /Contents and Link /A /URI per page, all closed forms of
      // (doc_id, page, length(text))
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.flatMap { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfAnnotsForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false)
            r.annotations.map { case (page, sub, txt) => (id, page.toLong, sub, txt) }
          }
        }.toDF("doc_id", "page", "subtype", "content")
        .orderBy("doc_id", "page", "subtype")
    }),
    "pdf_attachments" -> ((s, dir) => {
      // embedded-file extraction (/Names → /EmbeddedFiles name tree,
      // ADDITIVE surface — attachments are documents too in a corpus
      // pipeline): three per doc, payloads decoded through the normal
      // filter chain; the oracle recomputes each payload's md5 from the
      // closed-form transform of the document text
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfAttachmentsForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false,
              captureAttachments = true)
            r.attachments.zipWithIndex.map { case ((name, bytes), i) =>
              md.reset()
              val hex = md.digest(bytes).map(b => f"$b%02x").mkString
              (id, i.toLong, name, bytes.length.toLong, hex)
            }
          }
        }.toDF("doc_id", "att_idx", "name", "n_bytes", "content_md5")
        .orderBy("doc_id", "att_idx")
    }),
    "pdf_form_fields" -> ((s, dir) => {
      // AcroForm field-value extraction (ADDITIVE surface — form values ARE
      // document text): dotted-name DFS over /Fields + /Kids; oracle is
      // Corpus.formFieldsExpectedText in closed form
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfFormFieldsForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false)
            (id, r.formFields.getOrElse(""), r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "form_fields", "failures")
        .orderBy("doc_id")
    }),
    "pdf_outline" -> ((s, dir) => {
      // /Outlines bookmark-tree extraction (ADDITIVE surface — the reference
      // never reads /Outlines): DFS "depth:title" walk over a tree whose
      // sibling chain scales with the page count plus a fixed depth-3
      // First-chain; oracle is Corpus.outlineExpectedText in closed form
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfOutlineForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false)
            (id, r.outline.getOrElse(""), r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "outline", "failures")
        .orderBy("doc_id")
    }),
    "pdf_extract_type0" -> ((s, dir) => {
      // Type0/Identity-H composite fonts (EXTENSION, opt-in extended mode):
      // 2-byte CIDs decoded through the FULL ToUnicode CMap — multi-char
      // destinations kept verbatim, surrogate-pair (non-BMP) destinations,
      // 4-hex-digit bfranges above 0xFF, and Identity passthrough for
      // unmapped CIDs. The reference parses these CMaps but never consults
      // entries above 0xFF (PdfFont.cs:40 written, never read), so
      // real-world Identity-H text is unreadable to it — default mode
      // replicates that surface (unit-pinned); the oracle is
      // Corpus.type0ExpectedText in SQL
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfType0ForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false,
              extendedFilters = true)
            (id, r.text, r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "text", "failures")
        .orderBy("doc_id")
    }),
    "pdf_extract_aes256" -> ((s, dir) => {
      // AES-256 decryption (V5/AESV3, ISO 32000-2) under the opt-in
      // extended mode — docs rotate the R6 hardened Algorithm-2.B hash, the
      // deprecated R5 single-SHA-256 precursor, and R6 with
      // /EncryptMetadata false; every doc carries a /Perms capsule the
      // reader validates against the recovered file key (Algorithm 13).
      // Same chunk contract as variant 0, so the oracle is the raw text.
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfAes256ForDoc(id, t),
              contentDelimiter = "", buffers = buffers, captureFragments = false,
              extendedFilters = true)
            (id, r.text, r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "text", "failures")
        .orderBy("doc_id")
    }),
    "pdf_owner_password_extended" -> ((s, dir) => {
      // Algorithm 7 owner-password decryption (EXTENSION, opt-in extended
      // mode — default mode keeps the reference's NotImplementedException
      // verbatim, gated by pdf_owner_password_error): the owner-only
      // documents EXTRACT with the owner password; docs rotate through the
      // R2 single-pass inversion, the R3 20-key-chain inversion, the
      // AESV2-R4 composition (RC4 /O inversion feeding the AES cipher
      // path), and the AES-256-R6 Algorithm-12 /OE unwrap
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfOwnerOnlyForDoc(id, t),
              password = Corpus.OwnerPassword,
              contentDelimiter = "", buffers = buffers, captureFragments = false,
              extendedFilters = true)
            (id, r.text, r.decodeFailures.toLong)
          }
        }.toDF("doc_id", "text", "failures")
        .orderBy("doc_id")
    }),
    "pdf_owner_password_error" -> ((s, dir) => {
      // owner-password-only documents: user auth fails with the empty
      // password, the reader reaches the reference's unimplemented
      // owner-authentication path (NotImplementedException,
      // Tokeniser.cs:810-840) — replicated as a STRUCTURED error row whose
      // exact shape (message, failure count, empty text, zero pages) the
      // oracle asserts verbatim
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
        .filter(_._1 % 2 == 0)
        .mapPartitions { it =>
          val buffers = new graft.pdf.WorkBuffers()
          it.map { case (id, t) =>
            val r = graft.pdf.PdfExtract.extract(Corpus.pdfOwnerOnlyFromText(t),
              contentDelimiter = "", buffers = buffers, captureFragments = false)
            (id, r.error.getOrElse(""), r.decodeFailures.toLong, r.text, r.pages.toLong)
          }
        }.toDF("doc_id", "error", "failures", "text", "n_pages")
        .orderBy("doc_id")
    }),
    "sql_pdf_extract" -> ((s, dir) => {
      // SQL surface: the whole parse stack as a scalar Catalyst expression
      graft.functions.GraftFunctions.register(s)
      Corpus.pagesCached(s, dir).createOrReplaceTempView("graft_pages")
      s.sql(
        """SELECT CAST(element_at(split(url, '/'), -1) AS BIGINT) AS doc_id,
          |       pdf_extract(html).kind AS kind,
          |       pdf_extract(html).text AS text
          |FROM graft_pages""".stripMargin).orderBy("doc_id")
    }),
    "url_canonical" -> ((s, dir) =>
      // URL-level dedup key: canonicalize deterministically-synthesized
      // messy urls (mixed case, default port, tracking params, fragment) —
      // both engines build the identical input from doc_id
      docs(s, dir).select(col("doc_id"),
          graft.functions.Urls.canonicalUrl(concat(
            lit("HTTPS://Example"), col("doc_id") % 7,
            lit(".COM:443/p"), col("doc_id") % 5,
            lit("?utm_source=a&id="), col("doc_id"),
            lit("&gclid=z&q="), col("doc_id") % 3,
            lit("#frag"))).as("canon_url"))
        .orderBy("doc_id")),
    "url_block_domains" -> ((s, dir) => {
      // UT1-style domain blocklist filtering, subdomains included: hosts
      // synthesized from doc_id (11 subdomains × 7 registrable domains);
      // blocklist hits example3.com (plus all subdomains), the single
      // host sub5.example2.com, and a domain absent from the corpus
      import s.implicits._
      val pages = docs(s, dir).select(col("doc_id"),
        concat(lit("https://sub"), (col("doc_id") % 11).cast("string"),
          lit(".example"), (col("doc_id") % 7).cast("string"),
          lit(".com/p/"), col("doc_id").cast("string")).as("url"))
      val blocklist = Seq("example3.com", "sub5.example2.com", "absent.org")
        .toDF("domain")
      graft.functions.Urls.dropBlockedDomains(pages, "url", "doc_id", blocklist)
        .select(col("doc_id"),
          graft.functions.Urls.hostOf(col("url")).as("host"))
        .orderBy("doc_id")
    }),
    "frontier_allowed" -> ((s, dir) => {
      // crawl-frontier composition (Frontier.allowed): 3 probe urls per doc
      // against 5 host arms — prefix disallow, allow-overrides-disallow
      // (longest match), empty disallow, a graftbot-specific group with a
      // $-anchored wildcard SHADOWING a disallow-all * group, and a host
      // with no robots.txt at all (RFC 9309: fully allowed); every verdict
      // a closed form of (doc_id % 5, ord)
      import s.implicits._
      val k = (col("doc_id") % 5).cast("string")
      val id = col("doc_id").cast("string")
      val targets = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), posexplode(array(
          concat(lit("https://h"), k, lit(".example.org/public/doc-"), id),
          concat(lit("https://h"), k, lit(".example.org/private/x-"), id),
          concat(lit("https://h"), k, lit(".example.org/file-"), id, lit(".pdf")))))
        .select(col("doc_id"), col("pos").cast("long").as("ord"), col("col").as("url"))
      val robots = Seq(
        ("h0.example.org", "User-agent: *\nDisallow: /private/"),
        ("h1.example.org", "User-agent: *\nDisallow: /\nAllow: /public"),
        ("h2.example.org", "User-agent: *\nDisallow:"),
        ("h3.example.org",
          "User-agent: graftbot\nDisallow: /*.pdf$\n\nUser-agent: *\nDisallow: /")
      ).toDF("host", "robots_txt")
      graft.sources.Frontier.allowed(targets, "url", robots)
        .orderBy("doc_id", "ord")
    }),
    "quality_funnel" -> ((s, dir) => {
      // composed keep/drop policy with first-failing-stage verdicts
      // (Funnel.verdicts): urls synthesized as in url_block_domains
      // (blocked arm %7==3 or sub5.example2.com), expected lang 'en'
      // (the corpus text is English-ish; its lang COLUMN is an unrelated
      // label) flipped to an impossible code on %13 (planted wrong_lang;
      // the stage also fires naturally on the de-predicted tail), text
      // replaced by a 7-word string on %9 (gopher word-count fail) or
      // padded with a repeated bigram run on %6 (repetitive); the oracle
      // recomputes EVERY stage from the same augmented inputs
      import s.implicits._
      val aug = docs(s, dir).select(col("doc_id"),
        concat(lit("https://sub"), (col("doc_id") % 11).cast("string"),
          lit(".example"), (col("doc_id") % 7).cast("string"),
          lit(".com/p/"), col("doc_id").cast("string")).as("url"),
        when(col("doc_id") % 13 === 0, lit("zz")).otherwise(lit("en")).as("lang"),
        // the stopword-bearing prefix is what lets documents PASS gopher's
        // ">= 2 distinct stop words" rule (the synthetic corpus has none) —
        // without it every doc funnels out at gopher_fail and the
        // repetitive/kept arms would be dead code in the gate
        when(col("doc_id") % 9 === 0, lit("just nine short words that fail gopher"))
          .when(col("doc_id") % 6 === 0,
            concat(lit("the corpus and its text "), col("text"),
              expr("repeat(' zqxw zqxw', 25)")))
          .otherwise(concat(lit("the corpus and its text "), col("text")))
          .as("text"))
      val blocklist = Seq("example3.com", "sub5.example2.com", "absent.org")
        .toDF("domain")
      graft.functions.Funnel.verdicts(aug, "doc_id", "url", "lang", "text",
          blocklist, minWords = 15)
        .orderBy("doc_id")
    }),
    "host_caps" -> ((s, dir) => {
      // per-host top-K cap (TopK.topKPerKey — typed combinable Aggregator,
      // NOT a window: map-side state caps at K per key, the shuffle ships
      // <=K rows per key per task): 7 host arms, deterministic integer
      // scores with guaranteed ties so the id tie-break is gate-visible
      val d = s.read.parquet(s"$dir/documents.parquet").select(
        concat(lit("h"), (col("doc_id") % 7).cast("string"),
          lit(".example.org")).as("host"),
        ((col("doc_id") * 31) % 101).as("score"),
        col("doc_id"))
      graft.functions.TopK.topKPerKey(d, "host", "score", "doc_id", k = 3)
        .orderBy("host", "rank")
    }),
    "split_assign" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          graft.functions.Sampling.split(col("doc_id")).as("split"))
        .orderBy("doc_id")),
    "mix_token_budget" -> ((s, dir) =>
      // corpus mixing: greedy hash-order prefix of each language up to a
      // 2000-token budget (bucketized two-pass shape; see Sampling scaladoc)
      graft.functions.Sampling.mixByTokenBudget(
        docs(s, dir), "lang", "doc_id", "text", budget = 2000L)
        .withColumnRenamed("grp", "lang")
        .orderBy("lang", "doc_id")),
    "decontamination" -> ((s, dir) =>
      Dedup.crossGroupContamination(docs(s, dir), "doc_id", "text", "source")
        .orderBy("id_a", "id_b")),
    "decontamination_13gram" -> ((s, dir) =>
      // GPT-3-style: docs sharing any 13-gram across sources, with the
      // count of distinct leaking 13-grams
      Dedup.ngramOverlapContamination(docs(s, dir), "doc_id", "text", "source")
        .orderBy("doc_id")),
    "stratified_sample" -> ((s, dir) => {
      // deterministic per-language sample: smallest hash buckets win —
      // reproducible under re-runs/repartitioning, unlike rand() sampling
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(graft.functions.Sampling.bucket(col("doc_id")), col("doc_id"))
      docs(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10)
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")
    }),
    "tokens_histogram" -> ((s, dir) =>
      // document-length distribution in 50-token buckets — the training-mix
      // length profile; one map-side-combined groupBy
      docs(s, dir)
        .select(TextStats.wsTokens(col("text")).as("n"))
        .select(expr("n div 50").as("bucket_50"))
        .groupBy("bucket_50").agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket_50")),
    "vocab_stats" -> ((s, dir) => {
      // global term frequencies: classic explode -> map-side partial count
      // -> single shuffle; top-50 with deterministic (count desc, term asc)
      val words = docs(s, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      words.groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(50)
    }),
    "vocab_size_by_lang" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy("lang")
        .agg(countDistinct(col("term")).as("vocab"))
        .orderBy("lang")),
    "tfidf_top_terms" -> ((s, dir) =>
      // per-document top-5 distinctive terms by tf·idf with an exact
      // integer-scaled idf (no ln() — engine-portable BIGINT score)
      TextStats.tfidfTopTerms(docs(s, dir), "doc_id", "text", topN = 5)
        .orderBy("doc_id", "rank")),
    "lm_score" -> ((s, dir) =>
      // CCNet-style LM quality score (corpus-trained bigram model,
      // add-one smoothing) as an EXACT INTEGER ppm surrogate — the per-doc
      // sum is order-independent, so the fixpoint hash-gates where a float
      // log-prob sum cannot
      TextStats.lmScore(docs(s, dir), "doc_id", "text").orderBy("doc_id")),
    "vocab_bigrams_by_lang" -> ((s, dir) => {
      // per-language top-5 bigrams (training-mix phrase profile): one
      // explode -> map-side-combined groupBy -> per-lang WindowGroupLimit;
      // ws materialized before the transform (CSE across the HOF boundary,
      // same rationale as Dedup.shinglesFromWords)
      import org.apache.spark.sql.expressions.Window
      val withWs = docs(s, dir)
        .select(col("lang"), split(trim(col("text")), "\\s+").as("ws"))
        .where(size(col("ws")) >= 2)
      val bg = withWs.select(col("lang"),
        explode(transform(sequence(lit(0), size(col("ws")) - 2),
          i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
          .as("bigram"))
      bg.groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("n").desc, col("bigram"))))
        .where(col("rn") <= 5)
        .select(col("lang"), col("bigram"), col("n"))
        .orderBy("lang", "bigram")
    }),
    // ------------------------------------------------------------ multimodal
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.extractMeta(Multimodal.mediaTable(s, dir)).toDF()
        .orderBy("doc_id")),
    "multimodal_frames" -> ((s, dir) =>
      // frame-sample + resize plumbing: video rows fan out to every-4th
      // frame with a deterministic frame fingerprint and 224-target resize
      Multimodal.sampleFrames(Multimodal.mediaTable(s, dir)).toDF()
        .orderBy("doc_id", "frame_idx")),
    "multimodal_real_decode" -> ((s, dir) => {
      // REAL media decoding, no codec libraries (RealMedia): even ids carry
      // a genuine 24bpp BMP (nonzero row padding — a stride bug corrupts
      // the channel sum), odd ids a PCM16 WAV (odd-sized junk LIST chunk —
      // the word-aligned chunk walk is gate-visible); dimensions, rate,
      // sample count and the pixel/sample-level feature are all closed
      // forms the oracle recomputes from the generation arms
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long]
        .map { id =>
          val payload = if (id % 2 == 0) Corpus.bmpForDoc(id) else Corpus.wavForDoc(id)
          val d = graft.multimodal.RealMedia.decode(payload)
            .getOrElse(sys.error(s"doc $id: payload failed to decode"))
          (id, d.container, d.width, d.height, d.sampleRate, d.nSamples, d.feature)
        }
        .toDF("doc_id", "container", "width", "height", "sample_rate",
          "n_samples", "feature")
        .orderBy("doc_id")
    }),
    "multimodal_real_png_gif" -> ((s, dir) => {
      // REAL compressed-image decoding, no codec libraries (RealMedia):
      // even ids carry a genuine zlib-deflated PNG whose rows cycle through
      // ALL FIVE filter types (a wrong unfilter arm corrupts the green
      // sum), odd ids a GIF89a with real variable-width LZW (wrong code
      // width / table growth / KwKwK corrupts the palette-red sum); both
      // features are closed forms the oracle recomputes from the
      // generation arms — the decoders must invert deflate+filtering and
      // LZW exactly to reproduce them
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long]
        .map { id =>
          val payload = if (id % 2 == 0) Corpus.pngForDoc(id) else Corpus.gifForDoc(id)
          val d = graft.multimodal.RealMedia.decode(payload)
            .getOrElse(sys.error(s"doc $id: payload failed to decode"))
          (id, d.container, d.width, d.height, d.feature)
        }
        .toDF("doc_id", "container", "width", "height", "feature")
        .orderBy("doc_id")
    }),
    "multimodal_real_mp4" -> ((s, dir) => {
      // REAL ISO-BMFF container parsing (RealMedia.decodeMp4): box walk
      // with 32/64-bit size forms, a decoy audio track routed away by
      // hdlr, tkhd 16.16 dims, mvhd timescale/duration, stts frame count —
      // all closed forms the oracle recomputes; duration_ms is the
      // decoder's integer division, floor-divided identically in SQL
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long]
        .map { id =>
          val d = graft.multimodal.RealMedia.decode(Corpus.mp4ForDoc(id))
            .getOrElse(sys.error(s"doc $id: mp4 failed to decode"))
          (id, d.width, d.height, d.sampleRate, d.nSamples, d.feature)
        }
        .toDF("doc_id", "width", "height", "timescale", "n_frames", "duration_ms")
        .orderBy("doc_id")
    }),
    "multimodal_real_jpeg" -> ((s, dir) => {
      // REAL baseline JPEG decoding (multimodal/Jpeg): marker walk, DHT
      // canonical Huffman, DQT dequant, MSB-first entropy decode with
      // 0xFF00 unstuffing, IDCT. Fixtures are per-8x8-block-constant
      // images (DCT round-trips constants bit-exactly), so the oracle
      // recomputes the decoded luma sum in closed form while the decoder
      // must run the full entropy+IDCT pipeline to produce it
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long]
        .map { id =>
          val d = graft.multimodal.RealMedia.decode(Corpus.jpegForDoc(id))
            .getOrElse(sys.error(s"doc $id: jpeg failed to decode"))
          (id, d.width, d.height, d.feature)
        }
        .toDF("doc_id", "width", "height", "luma_sum")
        .orderBy("doc_id")
    }),
    "multimodal_real_mp3" -> ((s, dir) => {
      // REAL MPEG-1 Layer III frame-header walk (RealMedia.decodeMp3):
      // syncsafe ID3v2 skip, sync word + version/layer fields, bitrate and
      // sample-rate tables, padding-bit frame-length arithmetic — frame
      // count and duration are closed forms the oracle recomputes; a
      // decoder that miscomputes any frame length desyncs and errors
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long]
        .map { id =>
          val d = graft.multimodal.RealMedia.decode(Corpus.mp3ForDoc(id))
            .getOrElse(sys.error(s"doc $id: mp3 failed to decode"))
          (id, d.sampleRate, d.nSamples, d.feature)
        }
        .toDF("doc_id", "sample_rate", "n_samples", "duration_ms")
        .orderBy("doc_id")
    }),
    // --------------------------------------------------------------- events
    "events_hourly" -> ((s, dir) =>
      Events.hourlyByType(s.read.parquet(s"$dir/events.parquet"))
        .orderBy("window_start", "event_type")),
    "events_sessions" -> ((s, dir) =>
      Events.userSessions(s.read.parquet(s"$dir/events.parquet"))
        .orderBy("user_id", "session_start")),
    "events_asof" -> ((s, dir) => {
      // as-of join: each purchase matched to the user's latest view at or
      // before it (merge-scan shape; see Events.asofJoin scaladoc)
      val ev = s.read.parquet(s"$dir/events.parquet")
      Events.asofJoin(
          ev.where(col("event_type") === "purchase"),
          ev.where(col("event_type") === "view"),
          "user_id", "ts", "event_id")
        .select(col("user_id"), col("left_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("asof_id").as("view_id"),
          col("asof_ts").as("view_ts"))
        .orderBy("purchase_id")
    }),
    "events_asof_stream_parity" -> ((s, dir) => {
      // the STREAMING as-of transform (stateful flatMapGroupsWithState)
      // run in batch: must reproduce Events.asofJoin row-for-row against
      // the identical oracle — gate evidence for the streaming code path
      import s.implicits._
      val ev = s.read.parquet(s"$dir/events.parquet")
      // StreamAsof's precondition: apply the batch null contract BEFORE
      // typing (null rows would kill the primitive encoder, not mismatch);
      // null-key/ts left rows would route around the join — the corpus has
      // none, so the passthrough union is omitted here
      val typed = ev.where(col("event_type").isin("view", "purchase") &&
          col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_id").isNotNull)
        .select(col("user_id").as("k"), col("ts"),
          col("event_id").as("id"),
          when(col("event_type") === "view", 0).otherwise(1).as("side"))
        .as[graft.streaming.AsofEvent]
      graft.streaming.StreamAsof.asofStream(typed)
        .toDF("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")
        .orderBy("purchase_id")
    })
  )

  /** DuckDB mirror of [[graft.pipeline.Corpus.pdfExpectedText]]: given list
    * column `ch` of shown chunks (64-char slices, each already carrying the
    * content delimiter) and variant column `v` = (doc_id//2)%9, the expected
    * extraction. Variant 1 (Td/TD/T* before every chunk but the first)
    * joins all chunks with newline; variant 2 (encoded font) writes the
    * ligature markers 'e' / 't' / 'a' as CIDs whose ToUnicode bfchar
    * targets <00660066> / <006600660069> / <00660066006C> the engine packs
    * to ﬀ = chr(64256), ﬃ = chr(64259) and ﬄ = chr(64260) — the latter two
    * through the reference's separate 12-digit lookahead branch, ﬄ via the
    * uppercase-'C'-only tail arm (reference: Tokeniser.cs:2616-2644);
    * variant 5 (per-chunk Tm, per-content newline state) joins within each
    * 8-chunk page only; every other variant concatenates — they vary the
    * FILE layout (encryption, xref stream + ObjStm, /Prev chain, malformed
    * tolerances, linearized front-xref), not the operator stream. */
  /** The greedy-packing recurrence as a recursive CTE (`p` = per-doc bin
    * assignment), shared by the pack_sequences and pack_bins oracles so the
    * overflow rule — the SQL twin of [[graft.pipeline.Packing.spills]] —
    * exists in exactly one place on the SQL side too. */
  private val packRecurrenceCte: String =
    """WITH RECURSIVE d AS (
           SELECT doc_id, doc_id % 16 AS stream,
                  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
                  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS rn
           FROM documents),
         p AS (
           SELECT doc_id, stream, n_tokens, rn,
                  CAST(0 AS BIGINT) AS bin, n_tokens AS filled
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.doc_id, d.stream, d.n_tokens, d.rn,
                  CASE WHEN p.filled + d.n_tokens > 2048 AND p.filled > 0
                       THEN p.bin + 1 ELSE p.bin END AS bin,
                  CASE WHEN p.filled + d.n_tokens > 2048 AND p.filled > 0
                       THEN d.n_tokens ELSE p.filled + d.n_tokens END AS filled
           FROM d JOIN p ON d.stream = p.stream AND d.rn = p.rn + 1)"""

  /** As-of join as the explicit ordered scan it is (union both tagged
    * sides, carry the last view forward per user; `side` orders a view at
    * the same ts BEFORE the purchase — ≤ semantics — and id breaks ts
    * ties). One copy oracles BOTH the batch merge scan and the streaming
    * state machine (`events_asof` / `events_asof_stream_parity`). */
  private val asofOracleSql: String =
    """WITH u AS (
           SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'view'
           UNION ALL
           SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'),
         w AS (
           SELECT user_id, ts, event_id, side,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS UNBOUNDED PRECEDING) AS view_id,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS UNBOUNDED PRECEDING) AS view_ts
           FROM u)
         SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, view_id, view_ts
         FROM w WHERE side = 1 ORDER BY purchase_id"""

  private val pdfExpectedSql: String =
    """CASE
         WHEN v = 1 THEN array_to_string(ch, chr(10))
         WHEN v = 2 THEN replace(replace(replace(array_to_string(ch, ''), 'e', chr(64256)), 't', chr(64259)), 'a', chr(64260))
         WHEN v = 5 THEN array_to_string(list_transform(
             generate_series(1, CAST(ceil(len(ch) / 8.0) AS BIGINT)),
             p -> array_to_string(ch[(p-1)*8+1 : p*8], chr(10))), '')
         ELSE array_to_string(ch, '')
       END"""

  /** Chars ADDED to length(text) by the variant's injected newlines:
    * variant 1 adds chunks-1, variant 5 adds chunks-pages, PDFs otherwise 0
    * (and HTML rows 0). */
  private val pdfExtraCharsSql: String =
    // greatest(..., 0): an empty text has 0 chunks, and chunks-1 must not
    // go negative (the Scala twin yields "" there)
    """CASE WHEN doc_id % 2 = 0 AND (doc_id // 2) % 9 = 1
             THEN greatest((length(text) + 63) // 64 - 1, 0)
           WHEN doc_id % 2 = 0 AND (doc_id // 2) % 9 = 5
             THEN (length(text) + 63) // 64 - ((length(text) + 63) // 64 + 7) // 8
           ELSE 0 END"""

  def oracleSql: Map[String, String] = Map(
    "pdf_extract_roundtrip" ->
      s"""WITH d AS (SELECT doc_id, text, (doc_id // 2) % 9 AS v,
                            regexp_extract_all(text, '.{1,64}') AS ch
                     FROM documents WHERE doc_id % 2 = 0)
          SELECT doc_id, $pdfExpectedSql AS text FROM d ORDER BY doc_id""",
    // pdf_spans: the fixed-layout probe (Corpus.pdfSpanProbe) makes every
    // span's values a closed form of length(text): page i covers extracted
    // chars [512*i, min(len, 512*(i+1))) and its content payload sits at
    // the affine file address spanProbeSrcOffset(i) — so this gate hashes
    // the actual byte offsets, not just the span count
    "pdf_spans" ->
      s"""WITH d AS (SELECT doc_id, least(length(text), ${Corpus.SpanProbeMaxChars}) AS len
                     FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id, len,
                       unnest(range(CAST((len + 511) // 512 AS BIGINT))) AS i
                FROM d)
          SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
                 CAST(512 * i AS BIGINT) AS start_pos,
                 CAST(least(len, 512 * (i + 1)) AS BIGINT) AS end_pos,
                 CAST(${Corpus.spanProbeSrcOffset(0)} + ${Corpus.spanProbeSrcOffset(1) - Corpus.spanProbeSrcOffset(0)} * i AS BIGINT) AS src_offset,
                 CAST(5 * i + 5 AS BIGINT) AS src_line
          FROM s ORDER BY doc_id, span_idx""",
    // html_spans: block i covers words [20i+1, 20i+20]; extracted offsets
    // are cumulative block lengths + i newline separators; source offset =
    // 69 (prefix 66 + "<p>") + 8 per prior line ("<p></p>\n") + cumulative
    // text; line = 3 + i (2 prefix newlines). A lone block needs > 16 words
    // (NumWordsRules); with >= 2 blocks every block is kept (full blocks
    // have 20 > 16 words, the last one's predecessor has 20 > 4).
    "html_spans" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                    FROM documents
                    WHERE length(trim(text)) > 0 AND NOT regexp_matches(text, '[&<>]')),
         b AS (SELECT doc_id, ws, len(ws) AS nw,
                      unnest(range(CAST((len(ws) + 19) // 20 AS BIGINT))) AS i
               FROM d WHERE len(ws) > 16),
         t AS (SELECT doc_id, i,
                      length(array_to_string(ws[CAST(20*i + 1 AS INT):CAST(least(20*i + 20, nw) AS INT)], ' ')) AS blen
               FROM b),
         c AS (SELECT doc_id, i, blen,
                      COALESCE(SUM(blen) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
               FROM t)
         SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
                CAST(cum + i AS BIGINT) AS start_pos,
                CAST(cum + i + blen AS BIGINT) AS end_pos,
                CAST(69 + 8*i + cum AS BIGINT) AS src_offset,
                CAST(3 + i AS BIGINT) AS src_line,
                'block' AS kind
         FROM c ORDER BY doc_id, span_idx""",
    "html_extract_roundtrip" ->
      "SELECT doc_id, 'doc ' || doc_id AS title, text FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id",
    "pdf_extract_delim_roundtrip" ->
      s"""WITH d AS (SELECT doc_id, text, (doc_id // 2) % 9 AS v,
                            list_transform(regexp_extract_all(text, '.{1,64}'), c -> c || '|') AS ch
                     FROM documents WHERE doc_id % 2 = 0)
          SELECT doc_id, $pdfExpectedSql AS text FROM d ORDER BY doc_id""",
    // Recrawl.delta statuses restated from the arm rules (the fingerprints
    // themselves are the Spark side's concern — the oracle checks the
    // CLASSIFICATION; removal wins over the changed/added arms because the
    // %7 rows never enter the next snapshot)
    "crawl_delta" ->
      """WITH d AS (SELECT doc_id FROM documents),
         s AS (
           SELECT 'https://example.org/doc/' || doc_id AS url,
                  CASE WHEN doc_id % 7 = 0 THEN 'removed'
                       WHEN doc_id % 5 = 0 THEN 'changed'
                       ELSE 'unchanged' END AS status FROM d
           UNION ALL
           SELECT 'https://example.org/doc/new-' || doc_id, 'added'
           FROM d WHERE doc_id % 3 = 0)
         SELECT url, status FROM s ORDER BY url""",
    // Corpus.htmlCharsetProbe: four encodings of (text twice + the
    // non-ASCII marker) — expected text is encoding-independent
    "html_charset_roundtrip" ->
      "SELECT doc_id, text || ' ' || text || ' Ähnlich café für' AS text FROM documents ORDER BY doc_id",
    // mirror of Corpus.htmlLayoutFromText / htmlLayoutExpected: words 1-12
    // -> <p>, 13-22/23-32 -> "- " list items, 33+ -> "a | b" table rows of
    // two 10-word cells (list slices are 1-based inclusive in DuckDB)
    "html_layout_roundtrip" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
         parts AS (SELECT doc_id,
           array_to_string(ws[1:12], ' ') AS p,
           CASE WHEN len(ws) > 12 THEN '- ' || array_to_string(ws[13:22], ' ') END AS i1,
           CASE WHEN len(ws) > 22 THEN '- ' || array_to_string(ws[23:32], ' ') END AS i2,
           CASE WHEN len(ws) > 32 THEN
             array_to_string(list_transform(generate_series(1, CAST(ceil((len(ws) - 32) / 20.0) AS BIGINT)), r ->
               array_to_string(ws[33 + 20*(r-1) : 42 + 20*(r-1)], ' ') ||
               CASE WHEN len(ws) > 42 + 20*(r-1)
                    THEN ' | ' || array_to_string(ws[43 + 20*(r-1) : 52 + 20*(r-1)], ' ')
                    ELSE '' END), chr(10)) END AS tbl
           FROM d)
         SELECT doc_id, concat_ws(chr(10), p, i1, i2, tbl) AS text
         FROM parts ORDER BY doc_id""",
    // n_spans: one span per CONTENT STREAM with text. Variant 2 splits
    // pages of >4 chunks into two content streams (/Contents array form),
    // so its span count is 2 per full page plus 1-or-2 for the last page
    // depending on its chunk remainder; every other variant has one
    // content per page.
    "extract_pipeline_mixed" ->
      s"""WITH d AS (SELECT doc_id, text, lang, (doc_id // 2) % 9 AS v,
                (length(text) + 63) // 64 AS chunks,
                ((length(text) + 63) // 64 + 7) // 8 AS pages
              FROM documents)
         SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'pdf' ELSE 'html' END AS kind,
         CAST(length(text) + $pdfExtraCharsSql AS BIGINT) AS n_chars,
         CAST(CASE WHEN doc_id % 2 = 0 THEN pages ELSE 1 END AS BIGINT) AS pages,
         CAST(CASE WHEN doc_id % 2 = 1 THEN 1
                   WHEN v = 2 THEN 2 * (pages - 1)
                        + (CASE WHEN chunks - 8 * (pages - 1) > 4 THEN 2 ELSE 1 END)
                   ELSE pages END AS BIGINT) AS n_spans,
         CAST(0 AS BIGINT) AS failures
         FROM d ORDER BY doc_id""",
    "extract_metrics_by_lang" ->
      s"""SELECT lang, count(*) AS n_docs,
         CAST(sum(length(text) + $pdfExtraCharsSql) AS BIGINT) AS total_chars,
         CAST(0 AS BIGINT) AS total_failures
         FROM documents GROUP BY lang ORDER BY lang""",
    "extract_metrics_fast" ->
      s"""SELECT CASE WHEN doc_id % 2 = 0 THEN 'pdf' ELSE 'html' END AS kind,
         count(*) AS n_docs,
         CAST(sum(length(text) + $pdfExtraCharsSql) AS BIGINT) AS total_chars,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN ((length(text)+63)//64 + 7)//8 ELSE 1 END) AS BIGINT) AS total_pages,
         CAST(0 AS BIGINT) AS total_failures
         FROM documents GROUP BY 1 ORDER BY kind""",
    "resume_after_checkpoint" ->
      s"""SELECT doc_id, CAST(length(text) + $pdfExtraCharsSql AS BIGINT) AS n_chars
          FROM documents WHERE doc_id % 7 <> 0 ORDER BY doc_id""",
    // all three committed thirds must survive the rewrite byte-for-byte
    "compact_checkpoint" ->
      s"""SELECT doc_id, CAST(length(text) + $pdfExtraCharsSql AS BIGINT) AS n_chars
          FROM documents ORDER BY doc_id""",
    "dedup_exact" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 4 = 0)
         SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
                count(*) AS n_docs, min(doc_id) AS keep_id
         FROM corpus GROUP BY 1 ORDER BY fp""",
    "dedup_ngram_jaccard" -> exactJaccardSql,
    "dedup_minhash_lsh" -> exactJaccardSql,
    "dedup_minhash_stream_parity" -> exactJaccardSql,
    "dedup_clusters" ->
      """WITH RECURSIVE docs AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
         sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
                FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
                      FROM docs WHERE len(ws) >= 3)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM inter
                   JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
                   WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.8),
         edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
         reach AS (SELECT u, v FROM edges
                   UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u)
         SELECT u AS doc_id, least(u, min(v)) AS cluster_rep
         FROM reach GROUP BY u ORDER BY doc_id""",
    "dedup_embedding_cosine" ->
      "SELECT vec_id AS id_a, vec_id + 100000 AS id_b FROM embeddings WHERE vec_id % 10 = 0 ORDER BY id_a",
    // exact copies share every signature bit (Hamming 0 passes all bands)
    // and no natural pair reaches cosine 0.95 in this corpus, so the
    // LSH+exact-verify output equals the planted-copy set
    "dedup_embedding_rplsh" ->
      "SELECT vec_id AS id_a, vec_id + 100000 AS id_b FROM embeddings WHERE vec_id % 10 = 0 ORDER BY id_a",
    "dedup_embedding_rplsh_mp" ->
      "SELECT vec_id AS id_a, vec_id + 100000 AS id_b FROM embeddings WHERE vec_id % 10 = 0 ORDER BY id_a",
    "dedup_chunks" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 4000000, text FROM documents WHERE doc_id % 6 = 0),
         d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM corpus),
         ch AS (SELECT doc_id, i AS pos, array_to_string(ws[i*20+1 : i*20+20], ' ') AS chunk
                FROM (SELECT doc_id, ws, unnest(generate_series(0, (len(ws)-1)//20)) AS i FROM d))
         SELECT md5(chunk) AS fp, count(*) AS n,
                min(doc_id) AS first_doc, CAST(min(pos) AS BIGINT) AS min_pos
         FROM ch GROUP BY 1 HAVING count(*) >= 2 ORDER BY fp""",
    // greedy packing is a per-stream recurrence -> recursive CTE stepping
    // row_number within each stream, reproducing the exact mapPartitions
    // scan (same overflow rule — Packing.spills — same per-stream bin
    // reset); ONE copy of the recurrence feeds both packing oracles
    "pack_sequences" ->
      (packRecurrenceCte +
      """
         SELECT doc_id, stream, bin, n_tokens FROM p ORDER BY doc_id"""),
    // W=40, S=30 (overlap 10): chunk count 1 for n<=40 else
    // ceil((n-40)/30)+1 = (n-11)//30 + 1; DuckDB list slice is 1-based
    // inclusive, Spark slice(start, length) — both clamp at the end
    "chunk_windows" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                    FROM documents WHERE length(trim(text)) > 0),
         k AS (SELECT doc_id, w, len(w) AS n,
                 CASE WHEN len(w) <= 40 THEN 1 ELSE (len(w) - 11) // 30 + 1 END AS nc
               FROM d),
         c AS (SELECT doc_id, n, w, unnest(generate_series(0, nc - 1)) AS i FROM k)
         SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           CAST(least(40, n - i * 30) AS BIGINT) AS n_tokens,
           array_to_string(w[i * 30 + 1 : i * 30 + 40], ' ') AS chunk
         FROM c ORDER BY doc_id, chunk_idx""",
    "pack_sequences_stream_parity" ->
      (packRecurrenceCte +
      """
         SELECT doc_id, stream, bin, n_tokens FROM p ORDER BY doc_id"""),
    "pack_bins" ->
      (packRecurrenceCte +
      """
         SELECT p.stream, p.bin, count(*) AS n_docs,
                CAST(sum(p.n_tokens) AS BIGINT) AS tot_tokens,
                md5(string_agg(doc.text, ' ' ORDER BY p.doc_id)) AS packed_fp,
                CAST(length(string_agg(doc.text, ' ' ORDER BY p.doc_id)) AS BIGINT) AS packed_len
         FROM p JOIN documents doc ON p.doc_id = doc.doc_id
         GROUP BY p.stream, p.bin ORDER BY p.stream, p.bin"""),
    // positions whose 20-gram repeats corpus-wide, merged to maximal spans
    // by the pos - row_number gaps-and-islands identity
    "dedup_exact_spans" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 7000000, text || ' ' || text FROM documents WHERE doc_id % 9 = 0),
         d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM corpus),
         pos AS (SELECT doc_id, i AS pos, md5(array_to_string(ws[i+1 : i+20], ' ')) AS fp
                 FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 20)) AS i
                       FROM d WHERE len(ws) >= 20)),
         dup AS (SELECT fp FROM pos GROUP BY fp HAVING count(*) >= 2),
         dp AS (SELECT doc_id, pos FROM pos WHERE fp IN (SELECT fp FROM dup)),
         isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                 FROM dp)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
                CAST(max(pos) + 20 AS BIGINT) AS end_pos, count(*) AS n_windows
         FROM isl GROUP BY doc_id, grp ORDER BY doc_id, start_pos""",
    "dedup_drop_common_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
         ch AS (SELECT doc_id, i AS pos, array_to_string(ws[i*5+1 : i*5+5], ' ') AS chunk
                FROM (SELECT doc_id, ws, unnest(generate_series(0, (len(ws)-1)//5)) AS i FROM d)),
         common AS (SELECT chunk FROM (SELECT chunk, count(DISTINCT doc_id) AS df
                                       FROM ch GROUP BY 1) WHERE df >= 3),
         kept AS (SELECT doc_id, pos, chunk FROM ch ANTI JOIN common USING (chunk)),
         agg AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS text_clean,
                        count(*) AS n_kept
                 FROM kept GROUP BY doc_id)
         SELECT d.doc_id, coalesce(a.text_clean, '') AS text_clean,
                CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
         FROM d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""",
    "text_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
         wc AS (SELECT doc_id, w, count(*) AS c
                FROM (SELECT doc_id, unnest(ws) AS w FROM d) GROUP BY 1, 2),
         doc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                        CAST(max(c) AS BIGINT) AS top_cnt,
                        CAST(sum(c * length(w)) AS BIGINT) AS char_sum
                 FROM wc GROUP BY 1),
         bg AS (SELECT doc_id, b, count(*) AS c FROM (
                  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
                  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
                        FROM d WHERE len(ws) >= 2)) GROUP BY 1, 2),
         bgd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bg,
                        CAST(count(*) AS BIGINT) AS distinct_bg FROM bg GROUP BY 1)
         SELECT doc.doc_id AS doc_id, n_words,
                (1000 * top_cnt) // n_words AS top_word_permille,
                CAST(coalesce((1000 * (total_bg - distinct_bg)) // total_bg, 0) AS BIGINT) AS dup_bigram_permille,
                (100 * char_sum) // n_words AS mean_word_len_centi
         FROM doc LEFT JOIN bgd ON bgd.doc_id = doc.doc_id ORDER BY doc_id""",
    // arithmetic mirrored operation-for-operation in IEEE double:
    // (x*127.0)/maxabs + 0.5, floor, with maxabs an exact max of |x|
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS maxabs
           FROM embeddings)
         SELECT vec_id AS id, CAST(i - 1 AS BIGINT) AS pos,
           CAST(CASE WHEN maxabs = 0 THEN 0
                ELSE floor((CAST(embedding[i] AS DOUBLE) * 127.0) / maxabs + 0.5) END AS BIGINT) AS qval
         FROM (SELECT vec_id, embedding, maxabs,
                 unnest(generate_series(1, len(embedding))) AS i FROM e)
         ORDER BY id, pos""",
    "ann_topk_bruteforce" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10)
         SELECT query_id, rank, neighbor_id FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                        e.vec_id) AS rank
           FROM q, embeddings e WHERE e.vec_id <> q.vec_id)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "ann_ivf" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id % 50 = 0),
         assigned AS (
           SELECT vec_id, embedding, cid FROM (
             SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cid) AS rn
             FROM embeddings e, cents c)
           WHERE rn = 1),
         probes AS (
           SELECT query_id, qemb, cid FROM (
             SELECT e.vec_id AS query_id, e.embedding AS qemb, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cid) AS rn
             FROM embeddings e, cents c WHERE e.vec_id < 10)
           WHERE rn <= 3)
         SELECT query_id, rank, neighbor_id FROM (
           SELECT p.query_id, a.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY p.query_id
               ORDER BY list_cosine_similarity(CAST(p.qemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) DESC, a.vec_id) AS rank
           FROM probes p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // two-stage SQ8 search mirrored stage by stage: the coarse score is the
    // integer dot product of the quantized vectors (same quantization
    // arithmetic as embedding_quantize — exact in both engines), the pool
    // boundary is deterministic on (idot DESC, id), and the re-rank is the
    // same double cosine as ann_topk_bruteforce
    "ann_quantized_rerank" ->
      """WITH e AS (SELECT vec_id AS id, embedding,
             list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS maxabs
           FROM embeddings),
         qz AS (SELECT id, embedding,
             list_transform(embedding, v -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(floor((CAST(v AS DOUBLE) * 127.0) / maxabs + 0.5) AS BIGINT) END) AS qvec
           FROM e),
         q AS (SELECT id AS query_id, embedding AS qemb, qvec AS qq FROM qz WHERE id < 10),
         coarse AS (SELECT q.query_id, q.qemb, c.id,
             list_dot_product(q.qq, c.qvec) AS idot
           FROM qz c JOIN q ON q.query_id <> c.id),
         pool AS (SELECT query_id, qemb, id FROM (
             SELECT query_id, qemb, id,
               row_number() OVER (PARTITION BY query_id ORDER BY idot DESC, id) AS rn
             FROM coarse) WHERE rn <= 25),
         rr AS (SELECT p.query_id, f.id AS neighbor_id,
             list_cosine_similarity(CAST(p.qemb AS DOUBLE[]), CAST(f.embedding AS DOUBLE[])) AS cos
           FROM pool p JOIN qz f ON f.id = p.id)
         SELECT query_id, rank, neighbor_id FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM rr) WHERE rank <= 5 ORDER BY query_id, rank""",
    // key = the canonical form of the synthesized messy URL (url_canonical
    // oracles the canonicalization itself step by step; here the oracle
    // asserts the END RESULT — a broken canonicalizer shifts keys and fails
    // the hash); argmax(score) with min-id tie-break as a window
    "dedup_keep_best" ->
      """WITH u AS (SELECT doc_id,
             'https://example' || (doc_id % 7) || '.com/p' || (doc_id % 5) AS key,
             CAST(length(text) AS BIGINT) AS score
           FROM documents),
         r AS (SELECT key, doc_id,
             count(*) OVER (PARTITION BY key) AS n_docs,
             row_number() OVER (PARTITION BY key ORDER BY score DESC, doc_id) AS rn
           FROM u)
         SELECT key, doc_id AS kept_id, CAST(n_docs AS BIGINT) AS n_docs
         FROM r WHERE rn = 1 ORDER BY key""",
    "tfidf_top_terms" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (SELECT doc_id, tf.term AS term, tf.tf AS tf, df.df AS df,
             tf.tf * ((1000 * n_docs) // df.df) AS score
           FROM tf JOIN df ON df.term = tf.term CROSS JOIN n),
         r AS (SELECT doc_id, term, tf, df, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
           FROM scored)
         SELECT doc_id, rank, term, tf, df, score
         FROM r WHERE rank <= 5 ORDER BY doc_id, rank""",
    "text_tokens" ->
      """SELECT doc_id,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS re_tokens
         FROM documents ORDER BY doc_id""",
    "text_quality" ->
      """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
         CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(len(list_filter(string_split(trim(text), ' '),
           w -> w IN ('the','a','an','of','and','to','in','is','it','that'))) AS BIGINT) AS n_stop
         FROM documents ORDER BY doc_id""",
    "text_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",
    "pii_scrub" ->
      """WITH aug AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.3.4' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN ' call +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ELSE '' END AS t
           FROM documents),
         st AS (SELECT doc_id, t,
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM aug),
         st2 AS (SELECT doc_id, t, t1,
             regexp_replace(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t2 FROM st)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t,  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t2, '\+[0-9][0-9 -]{6,}[0-9]')) AS BIGINT) AS n_phones,
           md5(regexp_replace(t2, '\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g')) AS redacted_fp,
           CAST(length(regexp_replace(t2, '\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
         FROM st2 ORDER BY doc_id""",
    "text_quality_filter" ->
      """SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words FROM documents
         WHERE len(string_split(trim(text), ' ')) BETWEEN 15 AND 100000
           AND (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) >= 3 * len(string_split(trim(text), ' '))
           AND (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) <= 12 * len(string_split(trim(text), ' '))
           AND len(list_filter(string_split(trim(text), ' '),
                 w -> w IN ('the','a','an','of','and','to','in','is','it','that'))) >= 1
         ORDER BY doc_id""",
    "events_sessions" ->
      """WITH o AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts FROM events),
         b AS (SELECT user_id, ts, CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS brk FROM o),
         s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM b)
         SELECT user_id, min(ts) AS session_start, count(*) AS n_events
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "events_asof" -> asofOracleSql,
    "events_asof_stream_parity" -> asofOracleSql,
    "text_gopher" ->
      """WITH aug AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- bullet line' || chr(10) || '- another bullet' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'to be continued...' || chr(10) || '# # #' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN ' ' || repeat('9 ', 10) ELSE '' END AS t
           FROM documents),
         sig AS (
           SELECT doc_id,
             CAST(len(string_split_regex(trim(t), '\s+')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(t, '\s+', '', 'g')) AS BIGINT) AS chars_in_words,
             CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash,
             CAST((length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT) AS n_ellipsis,
             CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
             CAST(len(list_filter(string_split(t, chr(10)),
               l -> starts_with(trim(l), '- ') OR starts_with(trim(l), '* '))) AS BIGINT) AS n_bullet_lines,
             CAST(len(list_filter(string_split(t, chr(10)),
               l -> ends_with(trim(l), '...'))) AS BIGINT) AS n_ellipsis_lines,
             CAST(len(list_filter(string_split_regex(trim(t), '\s+'),
               w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
             CAST(len(list_intersect(list_distinct(string_split_regex(lower(trim(t)), '\s+')),
               ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop_distinct
           FROM aug)
         SELECT doc_id, n_words, chars_in_words, n_hash, n_ellipsis, n_lines, n_bullet_lines,
           n_ellipsis_lines, n_alpha_words, n_stop_distinct,
           CASE WHEN n_words >= 15 AND n_words <= 100000
                 AND chars_in_words >= n_words * 3 AND chars_in_words <= n_words * 10
                 AND n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words
                 AND n_bullet_lines * 10 <= n_lines * 9
                 AND n_ellipsis_lines * 10 <= n_lines * 3
                 AND n_alpha_words * 10 >= n_words * 8
                 AND n_stop_distinct >= 2
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS keep
         FROM sig ORDER BY doc_id""",
    // the window restatement is oracle-side only (DuckDB is single-node);
    // the Spark side is the combinable top-K Aggregator, never a window
    "host_caps" ->
      """WITH d AS (SELECT 'h' || (doc_id % 7) || '.example.org' AS host,
                           (doc_id * 31) % 101 AS score, doc_id FROM documents),
         r AS (SELECT host, score, doc_id,
                 row_number() OVER (PARTITION BY host ORDER BY score DESC, doc_id ASC) AS rank
               FROM d)
         SELECT host, CAST(rank AS BIGINT) AS rank, doc_id, CAST(score AS BIGINT) AS score
         FROM r WHERE rank <= 3 ORDER BY host, rank""",
    // per-(host arm, probe path) verdicts in closed form: h0 blocks only
    // /private/, h1 allows only /public (longest-match), h2 blocks nothing,
    // h3's graftbot group blocks only *.pdf (shadowing the disallow-all *
    // group), h4 has no robots.txt -> everything allowed
    "frontier_allowed" ->
      """WITH t AS (SELECT doc_id, i AS ord, doc_id % 5 AS k
                    FROM documents, generate_series(0, 2) s(i))
         SELECT doc_id, CAST(ord AS BIGINT) AS ord,
           'https://h' || k || '.example.org' ||
             CASE ord WHEN 0 THEN '/public/doc-' || doc_id
                      WHEN 1 THEN '/private/x-' || doc_id
                      ELSE '/file-' || doc_id || '.pdf' END AS url,
           CASE WHEN k = 0 THEN ord != 1
                WHEN k = 1 THEN ord = 0
                WHEN k = 3 THEN ord != 2
                ELSE true END AS allowed
         FROM t ORDER BY doc_id, ord""",
    // every funnel stage recomputed from the same augmented inputs: blocked
    // arm in closed form, langid/gopher/repetition CTEs are the same
    // restatements as their standalone oracles, applied to t
    "quality_funnel" ->
      """WITH aug AS (
           SELECT doc_id,
             CASE WHEN doc_id % 9 = 0 THEN 'just nine short words that fail gopher'
                  WHEN doc_id % 6 = 0 THEN 'the corpus and its text ' || text || repeat(' zqxw zqxw', 25)
                  ELSE 'the corpus and its text ' || text END AS t,
             CASE WHEN doc_id % 13 = 0 THEN 'zz' ELSE 'en' END AS lg,
             (doc_id % 7 = 3) OR (doc_id % 11 = 5 AND doc_id % 7 = 2) AS blocked
           FROM documents),
         lid AS (SELECT doc_id,
           len(list_filter(string_split(lower(trim(t)), ' '), w -> w IN ('der','die','und','das','nicht','von','ist','mit','den','ein'))) AS h_de,
           len(list_filter(string_split(lower(trim(t)), ' '), w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS h_en,
           len(list_filter(string_split(lower(trim(t)), ' '), w -> w IN ('el','la','de','que','y','en','un','los','del','las'))) AS h_es,
           len(list_filter(string_split(lower(trim(t)), ' '), w -> w IN ('le','la','les','et','des','un','une','du','que','est'))) AS h_fr,
           len(list_filter(string_split(lower(trim(t)), ' '), w -> w IN ('的','了','是','我','不','在','有','人','这','他'))) AS h_zh
           FROM aug),
         pred AS (SELECT doc_id, CASE
           WHEN h_de = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'de'
           WHEN h_en = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'en'
           WHEN h_es = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'es'
           WHEN h_fr = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'fr'
           ELSE 'zh' END AS pred_lang FROM lid),
         gsig AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(t), '\s+')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(t, '\s+', '', 'g')) AS BIGINT) AS chars_in_words,
             CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash,
             CAST((length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT) AS n_ellipsis,
             CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
             CAST(len(list_filter(string_split(t, chr(10)),
               l -> starts_with(trim(l), '- ') OR starts_with(trim(l), '* '))) AS BIGINT) AS n_bullet_lines,
             CAST(len(list_filter(string_split(t, chr(10)),
               l -> ends_with(trim(l), '...'))) AS BIGINT) AS n_ellipsis_lines,
             CAST(len(list_filter(string_split_regex(trim(t), '\s+'),
               w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
             CAST(len(list_intersect(list_distinct(string_split_regex(lower(trim(t)), '\s+')),
               ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop_distinct
           FROM aug),
         gk AS (SELECT doc_id,
           CASE WHEN n_words >= 15 AND n_words <= 100000
                 AND chars_in_words >= n_words * 3 AND chars_in_words <= n_words * 10
                 AND n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words
                 AND n_bullet_lines * 10 <= n_lines * 9
                 AND n_ellipsis_lines * 10 <= n_lines * 3
                 AND n_alpha_words * 10 >= n_words * 8
                 AND n_stop_distinct >= 2
                THEN 1 ELSE 0 END AS keep FROM gsig),
         d AS (SELECT doc_id, string_split(trim(t), ' ') AS ws FROM aug),
         bg AS (SELECT doc_id, b, count(*) AS c FROM (
                  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
                  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
                        FROM d WHERE len(ws) >= 2)) GROUP BY 1, 2),
         bgd AS (SELECT doc_id, (1000 * (sum(c) - count(*))) // sum(c) AS dup FROM bg GROUP BY 1)
         SELECT aug.doc_id AS doc_id,
           CASE WHEN blocked THEN 'blocked_url'
                WHEN pred_lang != lg THEN 'wrong_lang'
                WHEN keep = 0 THEN 'gopher_fail'
                WHEN coalesce(dup, 0) >= 200 THEN 'repetitive'
                ELSE 'kept' END AS verdict
         FROM aug
         JOIN pred USING (doc_id) JOIN gk USING (doc_id)
         LEFT JOIN bgd USING (doc_id)
         ORDER BY doc_id""",
    "text_langid" ->
      """WITH h AS (SELECT doc_id,
           len(list_filter(string_split(lower(trim(text)), ' '), w -> w IN ('der','die','und','das','nicht','von','ist','mit','den','ein'))) AS h_de,
           len(list_filter(string_split(lower(trim(text)), ' '), w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS h_en,
           len(list_filter(string_split(lower(trim(text)), ' '), w -> w IN ('el','la','de','que','y','en','un','los','del','las'))) AS h_es,
           len(list_filter(string_split(lower(trim(text)), ' '), w -> w IN ('le','la','les','et','des','un','une','du','que','est'))) AS h_fr,
           len(list_filter(string_split(lower(trim(text)), ' '), w -> w IN ('的','了','是','我','不','在','有','人','这','他'))) AS h_zh
           FROM documents)
         SELECT doc_id, CASE
           WHEN h_de = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'de'
           WHEN h_en = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'en'
           WHEN h_es = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'es'
           WHEN h_fr = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'fr'
           ELSE 'zh' END AS pred_lang
         FROM h ORDER BY doc_id""",
    // document_id: the reference renders each trailer /ID hex string as
    // '"<hex>"; ' (StrTok.render keeps the angle brackets and wraps in
    // double quotes); variant 3's /ID is the fixed encryption docId (the
    // file key derives from it), every other variant's is the 32-digit
    // zero-padded hex of the text length
    "pdf_metadata" ->
      """WITH d AS (SELECT doc_id, text, (doc_id // 2) % 9 AS v,
              CASE WHEN (doc_id // 2) % 9 = 3 THEN '0123456789abcdef0123456789abcdef'
                   ELSE printf('%032x', length(text)) END AS h
            FROM documents WHERE doc_id % 2 = 0)
         SELECT doc_id,
         CASE WHEN v = 4 THEN '1.5' ELSE '1.4' END AS pdf_version,
         'Title: doc-' || length(text) || '; Producer: graft; ' AS info,
         CAST(((length(text)+63)//64 + 7)//8 AS BIGINT) AS n_pages,
         '<graft:meta len="' || length(text) || '"/>' AS metadata,
         '"<' || h || '>"; "<' || h || '>"; ' AS document_id
         FROM d ORDER BY doc_id""",
    "sql_pdf_extract" ->
      s"""WITH d AS (SELECT doc_id, text, (doc_id // 2) % 9 AS v,
                            regexp_extract_all(text, '.{1,64}') AS ch
                     FROM documents)
          SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'pdf' ELSE 'html' END AS kind,
          CASE WHEN doc_id % 2 = 0 THEN $pdfExpectedSql ELSE text END AS text
          FROM d ORDER BY doc_id""",
    "pdf_extract_extended" ->
      """SELECT doc_id, text, CAST(0 AS BIGINT) AS failures
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "pdf_extract_predictors" ->
      """SELECT doc_id, text, CAST(0 AS BIGINT) AS failures
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "pdf_extract_extended_aes" ->
      """SELECT doc_id, text, CAST(0 AS BIGINT) AS failures
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "pdf_extract_hybrid_xref" ->
      """SELECT doc_id, text, CAST(0 AS BIGINT) AS failures
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    // independent restatement: same constructed input, dedup via a
    // first-occurrence window (empty lines always kept)
    "text_dedup_lines" ->
      """WITH d AS (SELECT doc_id,
             text || chr(10) || 'dup-line' || chr(10) || substr(text, 1, 20)
               || chr(10) || 'dup-line' || chr(10) || chr(10) || 'dup-line'
               || chr(10) || chr(10) || text AS input
           FROM documents WHERE doc_id % 2 = 0),
         l AS (SELECT doc_id, unnest(string_split(input, chr(10))) AS line,
                      unnest(generate_series(1, len(string_split(input, chr(10))))) AS ord
               FROM d),
         r AS (SELECT doc_id, line, ord,
                      row_number() OVER (PARTITION BY doc_id, line ORDER BY ord) AS rn
               FROM l)
         SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS text
         FROM r WHERE rn = 1 OR line = '' GROUP BY doc_id ORDER BY doc_id""",
    // every column is a closed form of doc_id/text — the builder and the
    // reader are independent of this restatement
    "warc_roundtrip" ->
      """SELECT doc_id, CAST(3 AS BIGINT) AS n_records,
                CAST(0 AS BIGINT) AS n_errors,
                'https://example.org/doc/' || doc_id AS url,
                strftime(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE,
                         '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
                text
         FROM documents ORDER BY doc_id""",
    "wet_roundtrip" ->
      """SELECT doc_id, CAST(3 AS BIGINT) AS n_records,
                CAST(1 AS BIGINT) AS n_conversion,
                'https://example.org/doc/' || doc_id AS url,
                strftime(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE,
                         '%Y-%m-%dT%H:%M:%SZ') AS wet_date,
                text || ' ¶wet-' || (doc_id % 9) AS text
         FROM documents ORDER BY doc_id""",
    // every entry restated as closed forms of (doc_id, idx): even ids a
    // urlset of doc_id%5+1 page urls (decoded '&' query on even idx),
    // odd ids a 2-entry index; lastmod on even idx only
    "sitemap_entries" ->
      """WITH k AS (SELECT unnest(range(5)) AS idx),
         e AS (SELECT doc_id, idx FROM documents CROSS JOIN k
               WHERE (doc_id % 2 = 0 AND idx < doc_id % 5 + 1)
                  OR (doc_id % 2 = 1 AND idx < 2))
         SELECT doc_id, CAST(idx AS BIGINT) AS idx,
                (doc_id % 2 = 1) AS is_index,
                CASE WHEN doc_id % 2 = 0
                     THEN 'https://example.org/doc/' || doc_id || '/p' || idx
                          || CASE WHEN idx % 2 = 0 THEN '?a=1&b=2' ELSE '' END
                     ELSE 'https://example.org/' || doc_id || '/s' || (idx + 1) || '.xml.gz'
                END AS loc,
                CASE WHEN idx % 2 = 0
                     THEN '2024-01-' || lpad(CAST((doc_id + idx) % 28 + 1 AS VARCHAR), 2, '0')
                     ELSE NULL END AS lastmod
         FROM e ORDER BY doc_id, idx""",
    // Corpus.feedForDoc surfaces: three kept items per doc, every field a
    // closed form of (doc_id, idx); the linkless arm never surfaces
    "feed_items" ->
      """WITH d AS (SELECT doc_id, doc_id % 7 AS k, doc_id % 2 = 0 AS rss FROM documents),
         u AS (
           SELECT doc_id, 0 AS idx,
                  CASE WHEN rss THEN 'rss' ELSE 'atom' END AS kind,
                  CASE WHEN rss THEN 'https://news.example/r' || doc_id || '/0'
                       ELSE 'https://news.example/a' || doc_id || '/0' END AS link,
                  't&' || k || ' 0' AS title,
                  CASE WHEN rss THEN '0' || (k + 1) || ' Jan 2024 00:00:00 GMT'
                       ELSE '2024-01-0' || (k + 1) || 'T00:00:00Z' END AS published
           FROM d
           UNION ALL
           SELECT doc_id, 1,
                  CASE WHEN rss THEN 'rss' ELSE 'atom' END,
                  CASE WHEN rss THEN 'https://news.example/r' || doc_id || '/1?a=1&b=2'
                       ELSE 'https://news.example/a' || doc_id || '/1?x=1&y=2' END,
                  't&' || k || ' 1',
                  CASE WHEN rss THEN NULL ELSE '2024-02-01T00:00:00Z' END
           FROM d
           UNION ALL
           SELECT doc_id, 2,
                  CASE WHEN rss THEN 'rss' ELSE 'atom' END,
                  CASE WHEN rss THEN 'https://news.example/r' || doc_id || '/2'
                       ELSE 'https://news.example/a' || doc_id || '/2' END,
                  NULL, NULL
           FROM d)
         SELECT doc_id, CAST(idx AS BIGINT) AS idx, kind, link, title, published
         FROM u ORDER BY doc_id, idx""",
    // independent restatement of every robots arm outcome as closed forms
    // of (doc_id, arm): even ids carry the specific graftbot group (arms
    // 0/3/4 allowed), odd ids fall to the * group (arms 2/3 allowed)
    "robots_allow" ->
      """WITH arms AS (SELECT unnest(range(5)) AS arm)
         SELECT doc_id, CAST(arm AS BIGINT) AS arm,
                CASE WHEN doc_id % 2 = 0 THEN arm IN (0, 3, 4)
                     ELSE arm IN (2, 3) END AS allowed,
                CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 7 + 1 AS BIGINT)
                     ELSE NULL END AS crawl_delay,
                'https://example.org/' || doc_id || '/sitemap.xml' AS sitemap
         FROM documents CROSS JOIN arms ORDER BY doc_id, arm""",
    // same decomposed prefix (chr() is codepoint-based in DuckDB), same
    // NFC function from DuckDB's utf8proc — two independent UAX #15
    // implementations must produce byte-identical output
    "text_normalize" ->
      """WITH d AS (SELECT doc_id,
             'cafe'||chr(769)||' nai'||chr(776)||'ve A'||chr(778)||' '||
               chr(4352)||chr(4449)||' '||chr(64257)||'sh '||text AS raw
           FROM documents)
         SELECT doc_id, nfc_normalize(raw) AS text,
                CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT) AS n_composed
         FROM d ORDER BY doc_id""",
    // independent restatement: same constructed input, corpus-wide
    // first-occurrence via a window over (doc_id, position); empty lines
    // always kept; docs losing every line come back as empty husks
    "dedup_corpus_lines" ->
      """WITH d AS (SELECT doc_id,
             'shared-'||(doc_id % 7)||chr(10)||md5(text)||chr(10)||'shared-'||(doc_id % 7)
               ||chr(10)||chr(10)||'tail-'||(doc_id % 5) AS input
           FROM documents),
         l AS (SELECT doc_id, unnest(string_split(input, chr(10))) AS line,
                      unnest(generate_series(1, len(string_split(input, chr(10))))) AS ord
               FROM d),
         r AS (SELECT doc_id, line, ord,
                      row_number() OVER (PARTITION BY line ORDER BY doc_id, ord) AS rn
               FROM l WHERE line <> ''),
         k AS (SELECT doc_id, line, ord FROM r WHERE rn = 1
               UNION ALL SELECT doc_id, line, ord FROM l WHERE line = ''),
         g AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS text,
                      count(*) AS n_kept
               FROM k GROUP BY doc_id)
         SELECT d.doc_id, coalesce(g.text, '') AS text,
                CAST(len(string_split(d.input, chr(10))) AS BIGINT) AS n_lines,
                coalesce(g.n_kept, 0) AS n_kept
         FROM d LEFT JOIN g USING (doc_id) ORDER BY doc_id""",
    // independent restatement of the integer fixpoint: the same
    // floor-div recurrence unrolled as 8 chained CTEs (DuckDB SUM(BIGINT)
    // widens to HUGEINT — exact — so only the final rank needs the cast)
    "link_pagerank" -> {
      val scale = "1000000000000"
      val rounds = (1 to 8).map { t =>
        s"""c$t AS (SELECT e.dst AS v, SUM(r${t - 1}.r // e.outdeg) AS s
           |       FROM e JOIN r${t - 1} ON r${t - 1}.v = e.src GROUP BY e.dst),
           |r$t AS (SELECT nodes.v,
           |       (SELECT ($scale * 15) // 100 // n FROM nn)
           |         + (85 * COALESCE(c$t.s, 0)) // 100 AS r
           |       FROM nodes LEFT JOIN c$t USING (v))""".stripMargin
      }.mkString(",\n")
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |nodes AS (SELECT doc_id AS v FROM documents),
         |e0 AS (SELECT doc_id AS src, (doc_id*31+7) % (SELECT n FROM nn) AS dst FROM documents
         |       UNION SELECT doc_id, (doc_id*17+3) % (SELECT n FROM nn) FROM documents
         |       UNION SELECT doc_id, (doc_id+1) % (SELECT n FROM nn) FROM documents),
         |deg AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY src),
         |e AS (SELECT e0.src, e0.dst, deg.outdeg FROM e0 JOIN deg USING (src)),
         |r0 AS (SELECT v, (SELECT $scale // n FROM nn) AS r FROM nodes),
         |$rounds
         |SELECT v AS doc_id, CAST(r AS BIGINT) AS rank FROM r8 ORDER BY doc_id""".stripMargin
    },
    // Corpus.htmlLinksProbe resolved URLs restated as closed forms of
    // (doc_id, length(text)); the CASE arms are the <base>-rebased odd ids
    // Corpus.htmlAnchorProbe edges: hrefs and anchor strings are closed
    // forms of doc_id (the javascript: and href-less arms never surface)
    "html_anchor_text" ->
      """WITH d AS (SELECT doc_id FROM documents),
         u AS (
           SELECT doc_id, 0 AS ord,
                  'https://hub.example/t' || (doc_id % 4) AS href,
                  'plain ' || (doc_id % 3) AS anchor FROM d
           UNION ALL
           SELECT doc_id, 1, 'https://example.org/t' || ((doc_id + 1) % 4),
                  'bold-' || (doc_id % 3) || ' tail' FROM d
           UNION ALL
           SELECT doc_id, 2, 'https://hub.example/t' || (doc_id % 4), '' FROM d
           UNION ALL
           SELECT doc_id, 3, 'https://hub.example/n1', 'one' FROM d
           UNION ALL
           SELECT doc_id, 4, 'https://hub.example/n2', 'two' FROM d)
         SELECT doc_id, CAST(ord AS BIGINT) AS ord, href, anchor
         FROM u ORDER BY doc_id, ord""",
    // same regenerated edges, aggregated the way Anchors.profile does —
    // the window restatement is oracle-side only (DuckDB is single-node);
    // the Spark side is two combinable hash aggs, never a window
    "anchor_profile" ->
      """WITH d AS (SELECT doc_id FROM documents),
         e AS (
           SELECT 'https://hub.example/t' || (doc_id % 4) AS dst,
                  'plain ' || (doc_id % 3) AS anchor FROM d
           UNION ALL
           SELECT 'https://example.org/t' || ((doc_id + 1) % 4),
                  'bold-' || (doc_id % 3) || ' tail' FROM d
           UNION ALL
           SELECT 'https://hub.example/t' || (doc_id % 4), '' FROM d
           UNION ALL
           SELECT 'https://hub.example/n1', 'one' FROM d
           UNION ALL
           SELECT 'https://hub.example/n2', 'two' FROM d),
         c AS (SELECT dst, anchor, count(*) AS cnt FROM e GROUP BY 1, 2),
         r AS (SELECT dst, anchor, cnt,
                 row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, anchor ASC) AS rn,
                 sum(cnt) OVER (PARTITION BY dst) AS n_refs,
                 count(*) OVER (PARTITION BY dst) AS n_anchors
               FROM c)
         SELECT dst, CAST(n_refs AS BIGINT) AS n_refs,
                CAST(n_anchors AS BIGINT) AS n_anchors, anchor AS top_anchor
         FROM r WHERE rn = 1 ORDER BY dst""",
    // Corpus.htmlJsonLdProbe: block 0 = the Article object, block 1 (odd
    // ids) = the array form ($.headline on an array -> NULL in both engines)
    "html_jsonld" ->
      """WITH b AS (
           SELECT doc_id, 0 AS idx,
             '{"@type":"Article","headline":"t-' || (doc_id % 9)
               || '","datePublished":"2024-01-0' || (doc_id % 9 + 1) || '"}' AS json,
             't-' || (doc_id % 9) AS headline,
             '2024-01-0' || (doc_id % 9 + 1) AS published
           FROM documents
           UNION ALL
           SELECT doc_id, 1,
             '[{"@type":"BreadcrumbList","position":' || (doc_id % 5) || '}]',
             NULL, NULL
           FROM documents WHERE doc_id % 2 = 1)
         SELECT doc_id, CAST(idx AS BIGINT) AS idx, json, headline, published
         FROM b ORDER BY doc_id, idx""",
    // Corpus.htmlOutlineProbe: three body headings per doc; the chrome /
    // commented / in-script decoys must NOT appear
    "html_outline" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS idx,
           CAST(CASE i WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END AS BIGINT) AS level,
           CASE i WHEN 0 THEN 'Ch & ap-' || (doc_id % 9)
                  WHEN 1 THEN 'Section ' || (doc_id % 5)
                  ELSE 'Sub a-' || (doc_id % 7) END AS title
         FROM documents, generate_series(0, 2) t(i)
         ORDER BY doc_id, idx""",
    // Corpus.htmlTableProbe: 8 cells in table 0 (incl. the empty structural
    // cell and the nested-table-punctured "pre post" cell), the nested
    // table's single cell as table 1, the <tr>-less loose table as table 2
    "html_tables" ->
      """WITH c(tbl, rw, cl, hdr, i) AS (VALUES
           (0,0,0,true,0),(0,0,1,true,1),(0,1,0,false,2),(0,1,1,false,3),
           (0,2,0,false,4),(0,2,1,false,5),(0,3,0,false,6),(0,3,1,false,7),
           (1,0,0,false,8),(2,0,0,false,9))
         SELECT doc_id, CAST(tbl AS BIGINT) AS table_idx,
           CAST(rw AS BIGINT) AS row_idx, CAST(cl AS BIGINT) AS col_idx,
           hdr AS is_header,
           CASE i WHEN 0 THEN 'name'
                  WHEN 1 THEN 'v & ' || (doc_id % 7)
                  WHEN 2 THEN 'a-' || (doc_id % 5)
                  WHEN 3 THEN ''
                  WHEN 4 THEN 'pre post'
                  WHEN 5 THEN 'b bold-' || (doc_id % 4)
                  WHEN 6 THEN 'u-' || (doc_id % 2)
                  WHEN 7 THEN 'v-' || (doc_id % 2)
                  WHEN 8 THEN 'in-' || (doc_id % 3)
                  ELSE 'loose-' || (doc_id % 9) END AS cell
         FROM documents, c
         ORDER BY doc_id, table_idx, row_idx, col_idx""",
    "html_links" ->
      """WITH d AS (SELECT doc_id, length(text) AS len FROM documents),
         u AS (
           SELECT doc_id, 0 AS ord, 'https://abs.example/a-' || len AS href FROM d
           UNION ALL
           SELECT doc_id, 1, CASE WHEN doc_id % 2 = 1
             THEN 'https://base' || doc_id || '.example/b' || (doc_id % 3) || '/dir/rel-' || (doc_id % 5) || '/p'
             ELSE 'https://example.org/doc/rel-' || (doc_id % 5) || '/p' END FROM d
           UNION ALL
           SELECT doc_id, 2, CASE WHEN doc_id % 2 = 1
             THEN 'https://base' || doc_id || '.example/root-' || (doc_id % 7)
             ELSE 'https://example.org/root-' || (doc_id % 7) END FROM d
           UNION ALL
           SELECT doc_id, 3, 'https://cdn.example/c-' || len FROM d
           UNION ALL
           SELECT doc_id, 4, CASE WHEN doc_id % 2 = 1
             THEN 'https://base' || doc_id || '.example/b' || (doc_id % 3) || '/up-1'
             ELSE 'https://example.org/up-0' END FROM d)
         SELECT doc_id, CAST(ord AS BIGINT) AS ord, href
         FROM u ORDER BY doc_id, ord""",
    // Corpus.htmlMetaProbe values are closed forms of (doc_id, length(text))
    "html_meta" ->
      """SELECT doc_id,
           'https://example'||(doc_id % 7)||'.com/p'||(doc_id % 5) AS canonical,
           'desc-'||length(text)||' & more' AS description,
           'og-'||length(text) AS og_title,
           'ogd-'||length(text) AS og_description,
           doc_id % 3 = 0 AS noindex,
           doc_id % 3 = 0 AS nofollow
         FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",
    // one FreeText + one Link per page, closed forms of (doc_id, page, len)
    "pdf_annotations" ->
      """WITH d AS (SELECT doc_id, length(text) AS len,
                           ((length(text)+63)//64 + 7)//8 AS p
                    FROM documents WHERE doc_id % 2 = 0),
         e AS (SELECT doc_id, len, unnest(generate_series(1, p)) AS i FROM d)
         SELECT doc_id, CAST(i AS BIGINT) AS page, 'FreeText' AS subtype,
                'note-'||i||'-'||len AS content
         FROM e
         UNION ALL
         SELECT doc_id, CAST(i AS BIGINT), 'Link',
                'https://ann'||(doc_id % 5)||'.example/p'||i
         FROM e
         ORDER BY doc_id, page, subtype""",
    // three attachments per doc, payloads are closed-form transforms of text
    "pdf_attachments" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS att_idx,
           CASE i WHEN 0 THEN 'att-0.txt' WHEN 1 THEN 'att-1.bin' ELSE 'att-2.txt' END AS name,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CASE i WHEN 0 THEN md5(text) WHEN 1 THEN md5(reverse(text))
                  ELSE md5(upper(text)) END AS content_md5
         FROM documents, generate_series(0, 2) t(i)
         WHERE doc_id % 2 = 0 ORDER BY doc_id, att_idx""",
    // Corpus.formFieldsExpectedText in closed form
    "pdf_form_fields" ->
      """SELECT doc_id,
           'title=t-'||length(text)||'|meta.lang=v1-'||length(text)
             ||'|meta.count=v2-'||length(text) AS form_fields,
           CAST(0 AS BIGINT) AS failures
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    // Corpus.outlineExpectedText: depth-3 subtree under chapter 0, then one
    // top-level chapter per page (p from the variant-0 page-count formula)
    "pdf_outline" ->
      """WITH d AS (SELECT doc_id, length(text) AS len,
                           greatest(((length(text)+63)//64 + 7)//8, 1) AS p
                    FROM documents WHERE doc_id % 2 = 0)
         SELECT doc_id,
           '0:ch-0-'||len||'|1:sec-0-'||len||'|2:sub-0-'||len ||
             coalesce('|' || array_to_string(
               ['0:ch-'||i||'-'||len for i in generate_series(1, p-1)], '|'), '')
             AS outline,
           CAST(0 AS BIGINT) AS failures
         FROM d ORDER BY doc_id""",
    // Corpus.type0ExpectedText: 'e' → "ff" (multi-char bfchar), 't' → U+1F600
    // (surrogate-pair bfchar); everything else round-trips through the
    // bfrange / Identity passthrough
    "pdf_extract_type0" ->
      """SELECT doc_id, replace(replace(text, 'e', 'ff'), 't', chr(128512)) AS text,
           CAST(0 AS BIGINT) AS failures
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "pdf_extract_aes256" ->
      """SELECT doc_id, text, CAST(0 AS BIGINT) AS failures
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "pdf_owner_password_extended" ->
      """SELECT doc_id, text, CAST(0 AS BIGINT) AS failures
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "pdf_owner_password_error" ->
      """SELECT doc_id,
           'UnsupportedOperationException: owner-password authentication is not implemented' AS error,
           CAST(1 AS BIGINT) AS failures, '' AS text, CAST(0 AS BIGINT) AS n_pages
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    // mirrors Urls.canonicalUrl step by step (all regexes RE2-safe)
    "url_canonical" ->
      """WITH u AS (SELECT doc_id,
             'HTTPS://Example' || (doc_id % 7) || '.COM:443/p' || (doc_id % 5)
               || '?utm_source=a&id=' || doc_id || '&gclid=z&q=' || (doc_id % 3)
               || '#frag' AS url
           FROM documents),
         c AS (SELECT doc_id,
             lower(regexp_extract(regexp_replace(url, '#.*', ''), '^([^:/?#]+://[^/?#]*)', 1)) AS sh,
             regexp_extract(regexp_replace(url, '#.*', ''), '^[^:/?#]+://[^/?#]*(.*)', 1) AS rest
           FROM u),
         d AS (SELECT doc_id,
             CASE WHEN sh LIKE 'https://%' THEN regexp_replace(sh, ':443$', '')
                  WHEN sh LIKE 'http://%' THEN regexp_replace(sh, ':80$', '')
                  ELSE sh END AS host,
             regexp_extract(rest, '^([^?]*)', 1) AS path0,
             array_to_string(list_filter(string_split(regexp_extract(rest, '\?(.*)', 1), '&'),
               p -> NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|fbclid|gclid)=')), '&') AS q
           FROM c)
         SELECT d.doc_id AS doc_id,
           CASE WHEN c.sh = '' THEN u.url  -- scheme-less: passthrough, like the Column fn
                ELSE host || (CASE WHEN path0 = '' THEN '/' ELSE path0 END)
                     || (CASE WHEN length(q) > 0 THEN '?' || q ELSE '' END) END AS canon_url
         FROM d JOIN c ON c.doc_id = d.doc_id JOIN u ON u.doc_id = d.doc_id
         ORDER BY doc_id""",
    // blocklist semantics spelled out per literal entry: host under domain
    // means host = d OR host ends with '.' || d (subdomain inclusion)
    "url_block_domains" ->
      """WITH u AS (SELECT doc_id,
             'sub' || (doc_id % 11) || '.example' || (doc_id % 7) || '.com' AS host
           FROM documents)
         SELECT doc_id, host FROM u
         WHERE NOT (host = 'example3.com' OR host LIKE '%.example3.com'
                 OR host = 'sub5.example2.com' OR host LIKE '%.sub5.example2.com'
                 OR host = 'absent.org' OR host LIKE '%.absent.org')
         ORDER BY doc_id""",
    // ((id%P)*(K%P))%P == (id*K)%P mathematically, but stays exact in
    // 64-bit for every id (the direct product overflows at id >= ~3.5e9);
    // 427799 = 2654435761 % 1000003
    "split_assign" ->
      """SELECT doc_id, CASE WHEN ((doc_id % 1000003) * 427799) % 1000003 % 100 < 80 THEN 'train'
         WHEN ((doc_id % 1000003) * 427799) % 1000003 % 100 < 90 THEN 'val' ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    // the bucketized two-pass selection collapses to ONE window cumsum in
    // the oracle: greedy prefix = rows whose cumulative-before is under
    // budget, ordered by (knuth-hash, doc_id) within the language
    "mix_token_budget" ->
      """WITH t AS (SELECT lang, doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             ((doc_id % 1000003) * 427799) % 1000003 AS ok
           FROM documents),
         c AS (SELECT lang, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY ok, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
           FROM t)
         SELECT lang, doc_id, n_tokens FROM c
         WHERE cum - n_tokens < 2000 ORDER BY lang, doc_id""",
    "decontamination" ->
      """WITH docs2 AS (SELECT doc_id, text, source, string_split(trim(text), ' ') AS ws FROM documents),
         sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
                FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
                      FROM docs2 WHERE len(ws) >= 3)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM inter
                   JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
                   WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.8)
         SELECT id_a, id_b, da.source AS group_a, db.source AS group_b
         FROM pairs JOIN docs2 da ON da.doc_id = id_a JOIN docs2 db ON db.doc_id = id_b
         WHERE da.source <> db.source ORDER BY id_a, id_b""",
    "decontamination_13gram" ->
      """WITH d AS (SELECT doc_id, source, string_split(trim(text), ' ') AS ws FROM documents),
         sh AS (SELECT DISTINCT doc_id, source, array_to_string(ws[i : i+12], ' ') AS sh
                FROM (SELECT doc_id, source, ws, unnest(generate_series(1, len(ws) - 12)) AS i
                      FROM d WHERE len(ws) >= 13))
         SELECT a.doc_id AS doc_id, a.source AS grp,
                CAST(count(DISTINCT a.sh) AS BIGINT) AS shared_ngrams
         FROM sh a JOIN sh b ON a.sh = b.sh AND a.source <> b.source
         GROUP BY 1, 2 ORDER BY doc_id""",
    "stratified_sample" ->
      """SELECT lang, doc_id FROM (
           SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
             ORDER BY ((doc_id % 1000003) * 427799) % 1000003 % 100, doc_id) AS rn
           FROM documents)
         WHERE rn <= 10 ORDER BY lang, doc_id""",
    "tokens_histogram" ->
      """SELECT len(string_split(trim(text), ' ')) // 50 AS bucket_50,
                count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY bucket_50""",
    "vocab_stats" ->
      """SELECT term, count(*) AS n FROM (
           SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents)
         GROUP BY term ORDER BY n DESC, term LIMIT 50""",
    "vocab_size_by_lang" ->
      """SELECT lang, CAST(count(DISTINCT term) AS BIGINT) AS vocab FROM (
           SELECT lang, unnest(string_split(trim(text), ' ')) AS term FROM documents)
         GROUP BY lang ORDER BY lang""",
    // independent restatement of the integer bigram-LM surrogate; DuckDB
    // SUM(BIGINT) widens to HUGEINT (exact), so only the outputs cast
    "lm_score" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
                    WHERE len(string_split(trim(text), ' ')) >= 2),
         bg AS (SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS bgk
                FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d)),
         c2 AS (SELECT bgk, count(*) AS n2 FROM bg GROUP BY bgk),
         c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1),
         vv AS (SELECT count(DISTINCT term) AS v FROM (
                  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents)),
         sc AS (SELECT bg.doc_id,
                       (1000000 * (c2.n2 + 1)) // (c1.n1 + (SELECT v FROM vv)) AS ppm
                FROM bg JOIN c2 USING (bgk) JOIN c1 USING (w1))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                CAST(SUM(ppm) AS BIGINT) AS sum_ppm,
                CAST(SUM(ppm) // count(*) AS BIGINT) AS avg_ppm
         FROM sc GROUP BY doc_id ORDER BY doc_id""",
    "vocab_bigrams_by_lang" ->
      """WITH d AS (SELECT lang, string_split(trim(text), ' ') AS ws FROM documents
                    WHERE len(string_split(trim(text), ' ')) >= 2),
         bg AS (SELECT lang, ws[i] || ' ' || ws[i+1] AS bigram
                FROM (SELECT lang, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d)),
         cnt AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
         r AS (SELECT lang, bigram, n,
                 row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn FROM cnt)
         SELECT lang, bigram, n FROM r WHERE rn <= 5 ORDER BY lang, bigram""",
    // n = UTF-8 BYTE length of the payload (the Scala path derives every
    // field from payload.length) — octet_length(encode(..)), matching the
    // multimodal_frames oracle; length(text) counts CHARACTERS and diverges
    // on any non-ASCII doc
    "multimodal_meta" ->
      """WITH v AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents)
         SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_kind,
         CAST(n AS BIGINT) AS n_bytes,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 64 + n % 512 END AS BIGINT) AS width,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 64 + (n * 7) % 512 END AS BIGINT) AS height,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 1 WHEN doc_id % 3 = 1 THEN 0 ELSE 1 + n % 24 END AS BIGINT) AS frames,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (n % 5) * 8000 ELSE 0 END AS BIGINT) AS sample_rate,
         md5(text) AS checksum
         FROM v ORDER BY doc_id""",
    // RealMedia closed forms: BMP channel sum over (x,y) as ONE
    // comprehension (x = i % w, y = i // w), WAV peak = max |sample|
    "multimodal_real_decode" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 3 AS h
                    FROM documents)
         SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS container,
           CAST(CASE WHEN doc_id % 2 = 0 THEN w ELSE 0 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN h ELSE 0 END AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                     ELSE 8000 * (1 + doc_id % 3) END AS BIGINT) AS sample_rate,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                     ELSE 50 + doc_id % 20 END AS BIGINT) AS n_samples,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN list_sum([((i % w) * 7 + (i // w) * 13 + doc_id) % 256
                               for i in generate_series(0, w * h - 1)])
                ELSE list_max([abs(((i * 31 + doc_id) % 2001) - 1000)
                               for i in generate_series(0, 50 + doc_id % 20 - 1)])
                END AS BIGINT) AS feature
         FROM d ORDER BY doc_id""",
    // RealMedia PNG/GIF closed forms: the decoders must invert zlib+all-5-
    // filters (PNG green sum) and variable-width LZW (GIF palette-red sum)
    // exactly to reproduce these comprehensions
    "multimodal_real_png_gif" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 5 AS w, 5 + doc_id % 3 AS h
                    FROM documents)
         SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS container,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN list_sum([((i % w) * 11 + (i // w) * 3 + 2 * doc_id) % 256
                               for i in generate_series(0, w * h - 1)])
                ELSE list_sum([((((i % w) * 5 + (i // w) * 7 + doc_id) % 256) * 3
                                + doc_id) % 256
                               for i in generate_series(0, w * h - 1)])
                END AS BIGINT) AS feature
         FROM d ORDER BY doc_id""",
    // RealMedia MP4 closed forms (generator arms in Corpus.mp4ForDoc)
    "multimodal_real_mp4" ->
      """SELECT doc_id,
           CAST(160 + 16 * (doc_id % 8) AS BIGINT) AS width,
           CAST(96 + 16 * (doc_id % 5) AS BIGINT) AS height,
           CAST(1000 * (1 + doc_id % 3) AS BIGINT) AS timescale,
           CAST(1 + doc_id % 24 AS BIGINT) AS n_frames,
           CAST((4000 + (doc_id * 7) % 9000) // (1 + doc_id % 3) AS BIGINT)
             AS duration_ms
         FROM documents ORDER BY doc_id""",
    // Jpeg closed forms: per-block-constant luma, 64 px per 8x8 block
    "multimodal_real_jpeg" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
                    FROM documents)
         SELECT doc_id,
           CAST(8 * bw AS BIGINT) AS width,
           CAST(8 * bh AS BIGINT) AS height,
           CAST(list_sum([64 * (((i % bw) * 29 + (i // bw) * 31 + doc_id) % 256)
                          for i in generate_series(0, bw * bh - 1)]) AS BIGINT)
             AS luma_sum
         FROM d ORDER BY doc_id""",
    // RealMedia MP3 closed forms (generator arms in Corpus.mp3ForDoc):
    // 1152 samples per MPEG-1 Layer III frame
    "multimodal_real_mp3" ->
      """WITH d AS (SELECT doc_id, 20 + doc_id % 30 AS frames,
                    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                                    ELSE 32000 END AS rate
                    FROM documents)
         SELECT doc_id,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(frames * 1152 AS BIGINT) AS n_samples,
           CAST((frames * 1152 * 1000) // rate AS BIGINT) AS duration_ms
         FROM d ORDER BY doc_id""",
    // stub decoder arithmetic mirrored exactly: payload = UTF-8 of text,
    // video kind = doc_id%3==2, frames = 1 + n%24, w/h from n, resize to
    // min(w,224) with integer floor division; frame fp = md5 of
    // payload ++ ':' ++ idx (same bytes both engines)
    "multimodal_frames" ->
      """WITH v AS (SELECT doc_id, text, octet_length(encode(text)) AS n
           FROM documents WHERE doc_id % 3 = 2),
         m AS (SELECT doc_id, text,
             64 + n % 512 AS w, 64 + (n * 7) % 512 AS h, 1 + n % 24 AS frames
           FROM v),
         f AS (SELECT doc_id, text, w, h,
             unnest(generate_series(0, CAST(frames - 1 AS BIGINT), 4)) AS frame_idx
           FROM m)
         SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           md5(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_fp,
           CAST(least(w, 224) AS BIGINT) AS out_w,
           CAST((h * least(w, 224)) // w AS BIGINT) AS out_h
         FROM f ORDER BY doc_id, frame_idx""",
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n_events,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    // SimHash restricted to normalized-exact-duplicate pairs (see the query
    // comment): banding surfaces every Hamming≤3 pair, equal CASE-SENSITIVE
    // normalized text gives Hamming 0, so the restricted output =
    // equal-fingerprint pairs (docs ≥ 4 words on both sides).
    "dedup_simhash" ->
      """WITH base AS (
           SELECT doc_id, text FROM documents
           WHERE len(string_split(trim(text), ' ')) >= 4),
         corpus AS (
           SELECT doc_id, text FROM base
           UNION ALL
           SELECT doc_id + 2000000, text FROM base WHERE doc_id % 5 = 0),
         fp AS (SELECT doc_id, md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
                FROM corpus)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         ORDER BY id_a, id_b""",
    // rolling_hash64 = fold over UTF-8 bytes of h*1099511628211 + byte,
    // 64-bit wrapping, seeded with the FNV offset basis — replayed in DuckDB
    // as a HUGEINT list_reduce mod 2^64 over the hex-decoded byte list.
    "text_rollinghash" ->
      """SELECT doc_id,
           CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                     THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS rhash
         FROM (
           SELECT doc_id,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(generate_series(1, length(hx) // 2), i ->
                   CAST((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
                      + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1 AS HUGEINT))),
               (a, b) -> (a * 1099511628211::HUGEINT + b) % 18446744073709551616::HUGEINT
             ) AS h
           FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents))
         ORDER BY doc_id"""
  )

  /** Exact word-3-gram Jaccard ≥ 0.8 pairs, computed natively by DuckDB —
    * the shared oracle for both the inverted-index exact join and the
    * MinHash-LSH + exact-verify path. */
  private val exactJaccardSql: String =
    """WITH docs AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
       sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
              FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
                    FROM docs WHERE len(ws) >= 3)),
       cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                 FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT id_a, id_b FROM inter
       JOIN cnt ca ON ca.doc_id = id_a
       JOIN cnt cb ON cb.doc_id = id_b
       WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.8
       ORDER BY id_a, id_b"""
}
