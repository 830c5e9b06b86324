package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import scala.util.hashing.MurmurHash3

/** Deduplication operators for training-data pipelines: exact (hash groupBy),
  * exact n-gram Jaccard (inverted shingle index join), MinHash+LSH
  * (signature → band buckets → candidate join → exact verify), and SimHash
  * (64-bit signature → Hamming-band buckets).
  *
  * Scale notes (the designs are chosen for 10^12 docs, tested at 10^2..10^4):
  *  - nothing here is O(n²): every candidate generation step is an equi-join
  *    on a derived key (shingle, band bucket), i.e. a plain shuffle Catalyst
  *    can plan, re-order and AQE-coalesce;
  *  - signatures are computed in one narrow pass (mapPartitions-free: the
  *    heavy lifting is in typed map functions so buffers stay per-JVM);
  *  - exact verification runs only on LSH candidates — at web scale that is
  *    the difference between 10^24 and ~10^8 pair evaluations;
  *  - the band-bucket shuffle key space is huge (band × 64-bit hash), so no
  *    reducer hot-spots; a pathological shingle ("all rights reserved …") is
  *    bounded by [[MaxBucket]]: shingles/buckets whose document frequency
  *    exceeds the cap are dropped BEFORE any self-join (stop-shingle cap —
  *    see [[dropHotKeys]]), so per-key join fan-out is ≤ MaxBucket² instead
  *    of quadratic in corpus size. Jaccard is then computed over the
  *    non-stop shingles on both sides of the ratio (numerator AND per-doc
  *    counts), i.e. stopword-removal semantics. The cap (default 1000) is
  *    far above any sandbox bucket (max df 25 at sf0.1), so oracle-checked
  *    results are exact at test scale; at web scale it is the difference
  *    between a bounded shuffle and a 10^16-row join on "click here".
  *
  * CACHE LIFECYCLE: the operators that build a capped inverted index or
  * candidate set ([[ngramJaccardPairs]], [[minhashCandidates]],
  * [[minhashDedupPairs]], [[ngramOverlapContamination]], [[simhashPairs]],
  * `Ann.rplshCosineDupPairs`) persist that index (MEMORY_AND_DISK,
  * evictable) so the expensive explode runs once per query instead of once
  * per downstream join. Every such cache is registered centrally; a
  * long-lived session that issues dedup queries in a loop should call
  * [[clearCaches]] between batches — results already materialized are
  * unaffected. DedupSpec's cache-lifecycle test pins the invariant that two
  * back-to-back invocations plus clearCaches() leave zero persisted RDDs.
  */
object Dedup {

  /** Stop-shingle / hot-bucket document-frequency cap. A shingle appearing in
    * B docs contributes B² rows to a shingle self-join; at Common-Crawl
    * scale boilerplate shingles hit B ≈ 10^8. Keys above the cap carry ~zero
    * Jaccard signal (they are in everything) and are dropped up front. */
  final val MaxBucket = 1000

  /** Drop rows whose `keyCols` group has more than `maxBucket` rows: one
    * map-side-combined count per key, then a left-anti join against the
    * (tiny — only pathological keys survive the filter) hot-key set, which
    * AQE turns into a broadcast anti-join. */
  def dropHotKeys(rows: DataFrame, maxBucket: Int, keyCols: String*): DataFrame = {
    val hot = rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("df"))
      .where(col("df") > maxBucket)
      .select(keyCols.map(col): _*)
    rows.join(hot, keyCols, "left_anti")
  }

  /** [[dropHotKeys]] over an EXPENSIVE input subtree: pins the raw input,
    * eagerly materializes the filtered result (one count job), then drops
    * the raw cache — the expensive explode runs once and only the useful
    * filtered copy stays cached. Filtered caches are tracked; a long-lived
    * session (or benchmark loop) calls [[clearCaches]] between batches to
    * release them — they are MEMORY_AND_DISK and evictable meanwhile. */
  private[graft] def dropHotKeysCached(raw: DataFrame, maxBucket: Int, keyCols: String*): DataFrame = {
    raw.persist()
    val filtered = dropHotKeys(raw, maxBucket, keyCols: _*).persist()
    filtered.count() // materialize while the raw cache is alive
    raw.unpersist()
    liveCaches.synchronized { liveCaches += filtered }
    filtered
  }

  private val liveCaches = mutable.ArrayBuffer.empty[DataFrame]

  /** Register an already-persisted frame with the operator-cache lifecycle so
    * [[clearCaches]] releases it (used by the operators here and by
    * `Ann.kmeansCentroids`, whose per-round centroid caches follow the same
    * discipline). */
  private[graft] def registerCache(df: DataFrame): Unit =
    liveCaches.synchronized { liveCaches += df }

  /** Test hook: the currently-registered operator caches (see the cache
    * lifecycle note in the object doc). */
  private[graft] def liveCacheSnapshot: Seq[DataFrame] =
    liveCaches.synchronized { liveCaches.toList }

  /** Unpersist every index cache produced by the dedup/LSH operators since
    * the last clear (safe to call between batches; results already computed
    * are unaffected, lazily re-derived ones recompute). */
  def clearCaches(): Unit = liveCaches.synchronized {
    liveCaches.foreach { df =>
      // a cache whose session has been stopped is already gone; don't let
      // its defunct BlockManager abort the sweep of the live ones
      try if (!df.sparkSession.sparkContext.isStopped) df.unpersist()
      catch { case _: Exception => () }
    }
    liveCaches.clear()
  }

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: fingerprint → group size + representative (min id).
    * One shuffle on the fingerprint; map-side partial aggregation applies. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(graft.functions.TextStats.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Key-level dedup with a quality-ranked representative: one row per
    * `keyCol` group carrying the kept id (max `scoreCol`, ties to the
    * smallest id — deterministic) and the group size. The canonical-URL
    * dedup step of a web corpus (key = canonicalized URL, score = text
    * length or a quality score): unlike [[exactGroups]] the content may
    * differ across fetches of the same page, so the group keeps the BEST
    * row, not an arbitrary one. Pure aggregation — the argmax rides the
    * struct ordering of min(struct(-score, id)), so there is exactly one
    * map-side-combined shuffle on the key and no window (a window would
    * still need the whole group in one task; the agg combines partials).
    *
    * A null score ranks WORST (coalesced to +Inf in the negated ordering):
    * Spark's raw struct min would sort the null field FIRST and crown the
    * null-score row, while SQL window engines default to nulls-last under
    * DESC — coalescing pins both engines to the same answer, and an
    * all-null group still keeps its min-id row.
    *
    * The ranking negates in DOUBLE, not long: a long cast truncates
    * fractional scores toward zero (5.9 and 5.1 would tie and the min-id
    * row win, violating the argmax contract), and -Long.MinValue overflows
    * back to Long.MinValue, ranking that row BEST. Casting to double FIRST
    * and then negating avoids both; integral scores beyond 2^53 may tie in
    * double precision (ties still resolve deterministically by id). */
  def keepBestPerKey(df: DataFrame, keyCol: String, idCol: String,
      scoreCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_docs"),
        min(struct(
          coalesce(-(col(scoreCol).cast("double")), lit(Double.PositiveInfinity)).as("neg_score"),
          col(idCol).as("id"))).as("best"))
      .select(col("key"), col("best.id").as("kept_id"), col("n_docs"))

  // ------------------------------------------- corpus-wide line dedup

  /** CCNet-style corpus-wide paragraph dedup (Wenzek et al. 2020 §4.1):
    * split every document into lines, keep each distinct non-empty line
    * only at its FIRST occurrence corpus-wide (ordered by (doc id, line
    * position) — deterministic regardless of partitioning), and rewrite
    * each document from its surviving lines. Empty lines always survive:
    * they carry paragraph structure, not content (same contract as the
    * per-document `dedup_lines` expression this composes with — run the
    * per-doc pass first to shrink the explode, then this pass to kill the
    * cross-document boilerplate the per-doc pass cannot see).
    *
    * Shape at 10^12 docs — three bounded shuffles, no windows, no
    * all-pairs step:
    *  1. winner per distinct line: `groupBy(md5(line)).agg(min(struct(id,
    *     pos)))` — map-side partials combine, so a line duplicated 10^9
    *     times ships ONE candidate row per map task, not 10^9 rows;
    *  2. survivor filter: LEFT SEMI join of the exploded lines against the
    *     winner table on (line-key, id, pos) — the join key is unique on
    *     both sides, so the boilerplate line that hits half the corpus
    *     never concentrates on one reducer (contrast a join on the line
    *     key alone, which would);
    *  3. reassembly: `groupBy(id)` + sort-by-position array join — state
    *     bounded by document length, never corpus size; the final stats
    *     join reuses this exchange's hash partitioning on id.
    *
    * The exploded line table is deliberately NOT cached (three linear
    * scans instead): unlike the NARROW md5/position tables the other
    * operators persist, it carries the full line text — corpus-sized — so
    * a MEMORY_AND_DISK copy would double the job's storage footprint for
    * one saved scan per branch.
    *
    * Returns (id, text, n_lines, n_kept) for EVERY input document —
    * a document whose every line loses comes back with text "" and
    * n_kept 0, so the caller can filter or keep husks explicitly. */
  def dedupLinesAcrossCorpus(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs.select(
      col(idCol).cast("long").as("id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val nonEmpty = lines.where(col("line") =!= "")
    val winners = nonEmpty
      .groupBy(md5(col("line")).as("lk"))
      .agg(min(struct(col("id"), col("pos"))).as("w"))
      .select(col("lk"), col("w.id").as("wid"), col("w.pos").as("wpos"))
    val kept = nonEmpty.join(winners,
        md5(col("line")) === col("lk") && col("id") === col("wid") &&
          col("pos") === col("wpos"), "left_semi")
      .unionByName(lines.where(col("line") === ""))
    val rebuilt = kept.groupBy(col("id")).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line")), "\n").as("text"),
      count(lit(1)).as("n_kept"))
    docs.select(col(idCol).cast("long").as("id"),
        size(split(col(textCol), "\n", -1)).cast("long").as("n_lines"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"),
        col("n_lines"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  // ------------------------------------------------------------- shingles

  /** Word k-shingles from a words-ARRAY column (codegen'd array
    * intrinsics). `ws` must be a bound attribute, not an inline
    * `split(...)` expression: the k `element_at` references inside the
    * lambda defeat common-subexpression elimination across the
    * higher-order-function boundary, so an inline split is re-executed
    * k·positions times per row — measured 58 s → 3 s on the sf0.1
    * 13-gram query just from materializing the array first. */
  def shinglesFromWords(ws: Column, k: Int): Column = {
    val starts = sequence(lit(0), size(ws) - k) // requires size >= k
    array_distinct(transform(starts, i =>
      concat_ws(" ", (0 until k).map(j => element_at(ws, i + j + 1)): _*)))
  }

  /** Word k-shingles of a text column (convenience; see the caveat on
    * [[shinglesFromWords]] — prefer materializing the split). */
  def shingleCol(textCol: Column, k: Int): Column =
    shinglesFromWords(split(trim(textCol), "\\s+"), k)

  /** (id, shingle) inverted-index rows, distinct per doc. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), split(trim(col(textCol)), "\\s+").as("ws"))
      .where(size(col("ws")) >= k)
      .select(col("id"), explode(shinglesFromWords(col("ws"), k)).as("sh"))

  // -------------------------------------------------- exact n-gram Jaccard

  /** All pairs with word-k-gram Jaccard ≥ `threshold`, via the inverted
    * shingle index: |A∩B| from a self-equi-join on shingle, |A∪B| from the
    * per-doc distinct counts. The join key is the shingle so co-occurrence
    * shuffles once; shingles hotter than `maxBucket` docs are dropped first
    * ([[dropHotKeys]]) — exact below the cap, stop-shingle semantics above. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8, maxBucket: Int = MaxBucket): DataFrame = {
    // the raw shingle explode is the expensive subtree and dropHotKeys reads
    // it twice (hot-key count + anti-join side) — see dropHotKeysCached
    val sh = dropHotKeysCached(shingles(docs, idCol, textCol, k), maxBucket, "sh")
    val cnt = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(cnt.as("ca"), col("id_a") === col("ca.id"))
      .join(cnt.as("cb"), col("id_b") === col("cb.id"))
      .where(col("i").cast("double") / (col("ca.n") + col("cb.n") - col("i")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  // --------------------------------------------------------- MinHash + LSH

  final val NumHashes = 128
  final val Bands = 32
  final val RowsPerBand = NumHashes / Bands // 4
  /** The word-shingle size every default caller (and the `minhash_bands`
    * SQL expression) uses. */
  final val DefaultShingleK = 3
  private final val MersennePrime = (1L << 61) - 1

  // Deterministic affine permutations over the Mersenne prime field
  // (standard MinHash construction; Broder 1997).
  private val hashAB: Array[(Long, Long)] = {
    val rnd = new java.util.Random(0x5eed5eedL)
    Array.fill(NumHashes)((math.abs(rnd.nextLong()) % MersennePrime + 1, math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** (a·x) mod (2^61−1) without overflow: a < 2^61, x < 2^32, so the full
    * product needs 93 bits — take it as (hi, lo) 128-bit halves via
    * `Math.multiplyHigh` and Mersenne-fold: a·x = hi·2^3·2^61 + lo, and
    * y mod (2^61−1) folds as (y & p) + (y >>> 61). The previous
    * formulation's `(a % p) * x` silently wrapped mod 2^64, so the hash
    * was NOT the documented affine permutation over GF(p) and the LSH
    * collision probability was not the Jaccard similarity. */
  private[graft] def mulModP(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x)
    val lo = a * x
    var r = (lo & MersennePrime) + ((lo >>> 61) | (hi << 3))
    if (r >= MersennePrime) r -= MersennePrime
    if (r >= MersennePrime) r -= MersennePrime
    r
  }

  /** 128-entry MinHash signature of a shingle set: true affine permutations
    * h_i(x) = (a_i·x + b_i) mod (2^61−1) — P[min collision] = Jaccard
    * (Broder 1997), which the banded-LSH miss-probability analysis relies
    * on. */
  def minhashSignature(shingleHashes: Iterator[Int]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    while (shingleHashes.hasNext) {
      val x = shingleHashes.next().toLong & 0xffffffffL
      var i = 0
      while (i < NumHashes) {
        val (a, b) = hashAB(i)
        var v = mulModP(a, x) + b
        if (v >= MersennePrime) v -= MersennePrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      ()
    }
    sig
  }

  def shingleHashes(text: String, k: Int): Iterator[Int] = {
    val ws = text.trim.split("\\s+")
    if (ws.length < k) Iterator.empty
    else (0 to ws.length - k).iterator
      .map(i => MurmurHash3.stringHash(ws.slice(i, i + k).mkString(" ")))
      .toSet.iterator
  }

  /** Band key of signature rows [b*RowsPerBand, (b+1)*RowsPerBand): the ONE
    * definition of the banding fold — the batch path and the streaming path
    * ([[graft.streaming.StreamMinhash]]) must bucket identically or the
    * streamed candidate set silently desyncs from the batch one. */
  def bandKey(sig: Array[Long], b: Int): Long = {
    var h = 1125899906842597L
    var j = b * RowsPerBand
    while (j < (b + 1) * RowsPerBand) { h = h * 31 + sig(j); j += 1 }
    h
  }

  /** (id, band, bucket) rows: LSH band keys of the MinHash signature. Null
    * text is dropped up front so BOTH branches agree: without the filter the
    * k=3 native expression (nullSafeEval) silently emits no rows while the
    * typed flatMap would NPE the task inside [[shingleHashes]]. */
  def minhashBands(docs0: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val docs = docs0.where(col(textCol).isNotNull)
    if (k == DefaultShingleK) {
      // the default shingle size runs through the native codegen expression
      // (graft.functions.MinhashBandsExpr): scan → signature → posexplode,
      // zero typed-row conversions
      import org.apache.spark.sql.GraftColumnBridge
      docs.select(col(idCol).cast("long").as("id"),
          posexplode(GraftColumnBridge.column(graft.functions.MinhashBandsExpr(
            GraftColumnBridge.expression(col(textCol))))).as(Seq("band", "bucket")))
        .select(col("id"), col("band"), col("bucket"))
    } else {
      val spark = docs.sparkSession
      import spark.implicits._
      docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val hs = shingleHashes(text, k)
          if (!hs.hasNext) Iterator.empty
          else {
            val sig = minhashSignature(hs)
            (0 until Bands).iterator.map(b => (id, b, bandKey(sig, b)))
          }
        }
        .toDF("id", "band", "bucket")
    }
  }

  /** Candidate pairs from LSH buckets (distinct, a<b). Buckets with more
    * than `maxBucket` members are dropped first: a degenerate bucket (10^6
    * exact copies of one boilerplate page) would otherwise enumerate 10^12
    * pairs — exact-dedup such clusters with [[exactGroups]] BEFORE the
    * near-dup pass; that is the standard web-pipeline ordering. */
  def minhashCandidates(bands: DataFrame, maxBucket: Int = MaxBucket): DataFrame = {
    // bands come from a per-row signature computation — pin before the
    // hot-count + anti-join + two self-join sides re-read it
    val b = dropHotKeysCached(bands, maxBucket, "band", "bucket")
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup detection with exact-Jaccard verification:
    * candidates from band buckets, then the exact inverted-index Jaccard is
    * computed ONLY for candidate pairs. Output = pairs with J ≥ threshold
    * (equals the exact ngramJaccardPairs result up to the LSH miss
    * probability (1-J^r)^b ≈ 5e-8 at J=0.8 with r=4,b=32). */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8, maxBucket: Int = MaxBucket): DataFrame =
    verifyCandidatesExact(docs, idCol, textCol,
      minhashCandidates(minhashBands(docs, idCol, textCol, k), maxBucket),
      k, threshold, maxBucket)

  /** Per-doc shingle-SET size above which [[verifyCandidatesExact]] falls
    * back from the collect_set formulation to the narrow-row inverted-index
    * one for pairs touching that doc: a 100k-shingle set materialized as one
    * array row and duplicated across every candidate pair it appears in is a
    * memory/skew hazard the row form does not have. */
  final val MaxSetSize = 100000

  /** The exact-Jaccard verification stage over an arbitrary candidate-pair
    * set `(id_a, id_b)` — shared by [[minhashDedupPairs]] and the streaming
    * banding's batch-parity gate query
    * (`StreamMinhash.batchParityPairs`). Uses the SAME hot-shingle cap as
    * [[ngramJaccardPairs]] so all paths agree on the (stop-shingle-free)
    * Jaccard value. Docs whose shingle set exceeds `maxSetSize` take the
    * narrow-row fallback (see [[MaxSetSize]]). */
  def verifyCandidatesExact(docs: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, k: Int = 3, threshold: Double = 0.8,
      maxBucket: Int = MaxBucket, maxSetSize: Int = MaxSetSize): DataFrame = {
    // normalize the candidate set up front: orientation a<b, self-pairs
    // dropped, duplicates collapsed — the verify is documented as
    // idempotent (StreamMinhash feeds it a per-band stream where the same
    // pair surfaces repeatedly), and output rows are driven off cand rows
    val cand = candidates.select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()
      .persist()
    // registered like every other operator cache so clearCaches() releases
    // it — a long-lived session must not accrue candidate sets across calls
    liveCaches.synchronized { liveCaches += cand }
    val sh = dropHotKeysCached(shingles(docs, idCol, textCol, k), maxBucket, "sh")
    // Exact verification touches ONLY docs that appear in some candidate
    // pair: shrink the inverted index to those ids (at web scale candidates
    // are a vanishing fraction of the corpus), then collect each candidate
    // doc's (already hot-capped) shingle SET and compute the intersection
    // PER PAIR with codegen'd array_intersect — two equi-joins on the pair
    // ids instead of a shingle self-join + re-aggregation. Set sizes are
    // bounded by document length, so a verification task holds one pair's
    // two sets, never a shingle bucket. Replaced the shingle-self-join
    // formulation: same exact Jaccard, ~2x less verify-stage work
    // (measured on the sf0.1 bench).
    // no forced broadcast() anywhere: usually tiny, but an adversarial
    // corpus can make candidates arbitrarily large — AQE picks broadcast
    // when the runtime size allows
    val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    // persisted: shSets feeds BOTH pair-join sides (and the oversized-doc
    // split below) — without the pin the semi-join + collect_set (the
    // expensive stage) would run once per consumer
    val shSets = sh.join(candIds, Seq("id"), "left_semi")
      .groupBy("id").agg(collect_set(col("sh")).as("shs"))
      .persist()
    liveCaches.synchronized { liveCaches += shSets }
    // OVERSIZED-DOC fallback: a doc whose (hot-capped) shingle set exceeds
    // maxSetSize would be duplicated as one giant array row per candidate
    // pair it appears in across both equi-join sides — correct but a
    // memory/skew hazard at web scale. Pairs touching such a doc instead run
    // through the narrow-row inverted-index formulation (same exact Jaccard,
    // rows stay one-shingle wide; each big set is still built ONCE in
    // shSets, which is fine — the hazard is per-pair duplication). The split
    // is read off the cached shSets (size(shs)), so detecting it costs one
    // count over the small per-candidate-doc aggregate — which also eagerly
    // materializes the cache both pair-join sides are about to read; with no
    // oversized docs (the common case) the pair plan is exactly the
    // collect_set one.
    val bigIds = shSets.where(size(col("shs")) > maxSetSize).select(col("id"))
    val nBig = bigIds.count()
    if (nBig > 0)
      org.slf4j.LoggerFactory.getLogger("graft.dedup")
        .warn(s"verifyCandidatesExact: $nBig candidate doc(s) exceed maxSetSize=$maxSetSize shingles; " +
          "their pairs verify via the narrow-row inverted-index path")
    val (candSmall, candBig) =
      if (nBig == 0) (cand, null)
      else {
        val flagged = cand
          .join(bigIds.select(col("id").as("id_a"), lit(true).as("big_a")), Seq("id_a"), "left")
          .join(bigIds.select(col("id").as("id_b"), lit(true).as("big_b")), Seq("id_b"), "left")
        (flagged.where(col("big_a").isNull && col("big_b").isNull).select(col("id_a"), col("id_b")),
          flagged.where(col("big_a").isNotNull || col("big_b").isNotNull).select(col("id_a"), col("id_b")))
      }
    val smallPairs = candSmall
      .join(shSets.select(col("id").as("id_a"), col("shs").as("sa")), Seq("id_a"))
      .join(shSets.select(col("id").as("id_b"), col("shs").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("double").as("i"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
      // i > 0 preserves the prior formulation's semantics at degenerate
      // thresholds: a pair must share at least one shingle to be emitted
      .where(col("i") > 0 && col("i") / (col("na") + col("nb") - col("i")) >= threshold)
      .select(col("id_a"), col("id_b"))
    if (candBig == null) smallPairs
    else {
      // narrow-row path: shingle equi-join restricted to docs of big pairs,
      // intersection via groupBy-count, |A∪B| from the per-doc counts —
      // the ngramJaccardPairs shape, gated to the candidate set. Rows come
      // from exploding the cached shSets (one wide row per doc unpacked to
      // narrow rows), not from re-scanning the raw inverted index.
      val bigDocIds = candBig.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
      val shBig = shSets.join(bigDocIds, Seq("id"), "left_semi")
        .select(col("id"), explode(col("shs")).as("sh"))
      val cntBig = shBig.groupBy("id").agg(count(lit(1)).as("n"))
      val bigPairs = shBig.as("a").join(shBig.as("b"),
          col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("i"))
        .join(candBig, Seq("id_a", "id_b"), "left_semi")
        .join(cntBig.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
        .join(cntBig.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
        .where(col("i").cast("double") / (col("na") + col("nb") - col("i")) >= threshold)
        .select(col("id_a"), col("id_b"))
      smallPairs.union(bigPairs)
    }
  }

  // ------------------------------------------------- decontamination

  /** Train/test contamination report: near-duplicate pairs (word-k-gram
    * Jaccard ≥ threshold) whose documents belong to DIFFERENT groups
    * (e.g. source, or the train/test split). Same inverted-index machinery
    * as [[ngramJaccardPairs]] with the group columns joined on. */
  def crossGroupContamination(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val pairs = ngramJaccardPairs(docs, idCol, textCol, k, threshold)
    val groups = docs.select(col(idCol).as("gid"), col(groupCol).as("grp"))
    pairs
      .join(groups.as("ga"), col("id_a") === col("ga.gid"))
      .join(groups.as("gb"), col("id_b") === col("gb.gid"))
      .where(col("ga.grp") =!= col("gb.grp"))
      .select(col("id_a"), col("id_b"),
        col("ga.grp").as("group_a"), col("gb.grp").as("group_b"))
  }

  /** GPT-3-style n-gram-overlap decontamination (Brown et al. 2020,
    * appendix C — public): flag every document sharing at least one
    * `n`-gram (default 13, the published choice) with ANY document of a
    * DIFFERENT group, reporting how many distinct n-grams leak. Inverted
    * n-gram index + one cross-group equi-join on the n-gram — no pair
    * enumeration, one shuffle keyed by the n-gram; hot n-grams capped like
    * every other candidate join here. */
  def ngramOverlapContamination(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 13, maxBucket: Int = MaxBucket): DataFrame = {
    // persist: the (expensive — 13-wide concat per position) shingle
    // subtree feeds BOTH sides of the self-join plus the hot-key count;
    // without it Spark recomputes it three times (measured 61 s -> ~3 s
    // on the sf0.1 bench corpus)
    val sh = dropHotKeysCached(
      docs
        .select(col(idCol).as("id"), col(groupCol).as("grp"),
          split(trim(col(textCol)), "\\s+").as("ws"))
        .where(size(col("ws")) >= n)
        .select(col("id"), col("grp"),
          explode(shinglesFromWords(col("ws"), n)).as("sh")),
      maxBucket, "sh")
    sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.grp") =!= col("b.grp"))
      .groupBy(col("a.id").as("doc_id"), col("a.grp").as("grp"))
      .agg(countDistinct(col("a.sh")).as("shared_ngrams"))
  }

  // -------------------------------------------- connected components (CC)

  /** Near-duplicate CLUSTERS from a pair list: connected components via
    * iterative min-label propagation (the standard Spark-scale CC shape —
    * each round is one shuffle join; rounds = graph diameter, which for
    * near-dup graphs is tiny). Returns (doc_id, cluster_rep = min id of the
    * component), one row per doc that appears in some pair. Keeping
    * `cluster_rep` and dropping the rest is the dedup policy.
    *
    * Throws `IllegalStateException` if the labels have not converged within
    * `maxRounds` propagation rounds (graph diameter exceeds the bound): a
    * silently-partial clustering is the worst failure mode — a 50+-diameter
    * component is implausible for near-dup graphs, so hitting the bound means
    * either pathological input or a bug, and both must surface. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    // symmetrize in ONE scan of `pairs` (explode of the two directions):
    // a unionAll of two selects over the same subtree computes the whole
    // upstream pair pipeline TWICE at materialization — no CSE across
    // union branches
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("u"), col("id_b").as("v")),
        struct(col("id_b").as("u"), col("id_a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist()
    // Each round's labels are localCheckpoint'ed (eager), which BOTH caches
    // them and TRUNCATES the logical lineage. The truncation is not optional:
    // `next` references `labels` twice (the neighbor join and the left join),
    // so with persist() alone the analyzed plan DOUBLES per round — 2^r nodes
    // by round r; analysis/explain cost explodes around round ~15, far below
    // the 50-round bound (found by this round's long-chain convergence test:
    // a 12-round graph OOM'd an 8 GB driver in plan rendering). With the
    // lineage cut every round plans against a constant-size LogicalRDD.
    // At cluster scale note localCheckpoint trades fault-tolerance for speed
    // (blocks die with an executor); a 10^12-row run would point
    // spark.checkpoint.dir at reliable storage and use checkpoint() instead.
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // convergence detection: labels are non-negative and MONOTONICALLY
    // non-increasing (least of own and neighbors' min), so the label SUM
    // strictly decreases iff any label changed — one cheap aggregate on the
    // already-materialized round result instead of an extra self-join+count
    // per round (the join was ~25% of each round's wall time)
    var prevSum = Long.MinValue
    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("label", "nlabel"), Seq("v"))
        .groupBy(col("u").as("id"))
        .agg(min(col("nlabel")).as("minNeighbor"))
      // NOTE: pointer jumping (label ← label(label)) was tried and MEASURED
      // SLOWER here (9.0 s vs 4.1-5.4 s on the sf0.1 bench): near-dup
      // graphs are cliquey with diameter 2-3, so the extra equi-join per
      // round costs more than the O(log d) round saving. It only pays on
      // long-chain graphs; min-label propagation is the right default.
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("minNeighbor"), col("label"))).as("label"))
        .localCheckpoint() // eager: materialize + cut lineage (see above)
      val s = next.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)
      changed = s != prevSum
      prevSum = s
      // drop the PREVIOUS round's checkpoint blocks NOW: localCheckpoint
      // persistence is RDD-level (not CacheManager), so it is reclaimed only
      // when the driver GCs the frame and the ContextCleaner notices —
      // under low driver allocation pressure that can be the whole loop, by
      // which point maxRounds full label-table copies sit in block storage
      // evicting the edges cache (at 10^8+ distinct docs each copy is GBs)
      releaseLocalCheckpoint(labels)
      labels = next
      rounds += 1
    }
    edges.unpersist()
    if (changed) {
      // fail LOUDLY: returning the current labels would be a silent wrong
      // answer (docs of one component split across clusters). Release the
      // final round's checkpoint blocks first — a caller that catches and
      // retries with a higher bound must not accumulate orphaned label
      // copies in block storage until driver GC.
      releaseLocalCheckpoint(labels)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds — " +
          "graph diameter exceeds the bound; raise maxRounds (near-dup graphs " +
          "are cliquey with diameter 2-3, so this usually means pathological input)")
    }
    // the converged labels are already materialized checkpoint blocks backing
    // the returned frame; the ContextCleaner reclaims them when unreachable
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"))
  }

  /** Unpersist the RDD blocks behind a `localCheckpoint()`ed frame.
    * `df.unpersist()` is a no-op there (the blocks live at the RDD layer,
    * not in the CacheManager), so the checkpointed RDD is reached through
    * the frame's `LogicalRDD` leaf. Non-blocking; a frame of any other
    * shape is left alone. */
  private def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  // ------------------------------------------------- chunk-level exact dedup

  /** Exact duplicated-chunk report (the paragraph-dedup shape used by C4 /
    * RefinedWeb-style pipelines, adapted to fixed `chunkWords`-word windows
    * since the corpus has no paragraph marks): split every document into
    * consecutive non-overlapping word windows, fingerprint each, and report
    * fingerprints occurring more than once corpus-wide with their count and
    * smallest doc id and smallest window index. One explode + one map-side-combined groupBy —
    * the same shuffle shape as [[exactGroups]], linear at 100 TB. */
  def duplicateChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 20): DataFrame = {
    val ws = col("ws") // materialized below — see shinglesFromWords caveat
    val chunks = transform(
      // Column `/` is double division; truncate back to the int window count
      sequence(lit(0), ((size(ws) - 1) / chunkWords).cast("int")),
      i => concat_ws(" ", slice(ws, i * chunkWords + 1, lit(chunkWords))))
    docs
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("ws"))
      .select(col("doc_id"), posexplode(chunks).as(Seq("pos", "chunk")))
      .groupBy(md5(col("chunk")).as("fp"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("first_doc"),
        min(col("pos")).cast("long").as("min_pos"))
      .where(col("n") >= 2)
  }

  /** C4-style boilerplate REMOVAL — the corpus-rewrite counterpart of
    * [[duplicateChunks]]'s report (Raffel et al. 2020 removed any line
    * occurring ≥3 times in the corpus; fixed word windows stand in for
    * lines since this corpus has no line marks): split each document into
    * consecutive non-overlapping `chunkWords`-word windows, drop every
    * window whose exact text occurs in ≥ `minDocs` DISTINCT documents, and
    * reassemble the survivors in order. Documents reduced to nothing stay in
    * the output with empty text (a rewrite must not silently drop rows).
    *
    * Shuffle shape: one explode at WINDOW granularity (|words|/chunkWords
    * rows — not per-word), one two-phase distinct-count agg on the window
    * text, one left-anti equi-join (the common set is tiny — AQE broadcasts
    * it), one per-doc reassembly agg, one equi-join back to the id spine.
    * No window function, no cartesian; linear at 100 TB. A corpus-hot
    * window (appearing everywhere) lands ONLY on the agg's map-side combine
    * and the anti-join probe side — never materialized per pair. */
  def dropCommonChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 5, minDocs: Int = 3): DataFrame = {
    val ws = col("ws")
    val chunks = transform(
      sequence(lit(0), ((size(ws) - 1) / chunkWords).cast("int")),
      i => concat_ws(" ", slice(ws, i * chunkWords + 1, lit(chunkWords))))
    val exploded = docs
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("ws"))
      .select(col("doc_id"), posexplode(chunks).as(Seq("pos", "chunk")))
    val common = exploded
      .groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= minDocs)
      .select(col("chunk"))
    val rebuilt = exploded.join(common, Seq("chunk"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("chunk")))).as("kept"))
      .select(col("doc_id"),
        array_join(transform(col("kept"), k => k.getField("chunk")), " ").as("text_clean"),
        size(col("kept")).cast("long").as("n_kept"))
    docs.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Exact-substring span dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better" — their suffix-array pass, restated
    * in the sliding-window form a shuffle engine can run): a token position
    * is DUPLICATED if the `windowTokens`-gram starting there occurs ≥
    * `minCount` times in the whole corpus (within-doc repeats count, as in
    * the paper); maximal runs of consecutive duplicated positions merge
    * into removal spans `[start_pos, end_pos)` (token offsets — the
    * byte-range analogue of the paper's output). Every duplicated
    * substring of ≥ windowTokens tokens is covered exactly.
    *
    * Shape: one explode (n windows per doc) → one groupBy on the gram
    * (map-side combined) → semi-join positions against the duplicated
    * grams → per-DOC island merge (`pos - row_number` gaps-and-islands)
    * whose window partition is one document's positions — bounded by doc
    * length, never by corpus size; the final (doc, island) groupBy reuses
    * the window's hash partitioning on doc_id (subset-key, no new
    * shuffle). No suffix array is materialized: the windowed restatement
    * trades the paper's O(total) suffix sort for an equi-join — the
    * shuffle-native formulation.
    *
    * The positions table feeds BOTH the count aggregate and the semi-join
    * probe; left as two lazy references, the dominant gram explode would
    * run twice (the differing exchanges block reuse). So the grams are
    * narrowed to their md5 fingerprints at the explode — (doc_id, pos, fp)
    * is ~windowTokens× smaller than the raw gram rows — and that narrow
    * table is persisted once (MEMORY_AND_DISK, released via
    * [[clearCaches]]; same discipline as [[dropHotKeysCached]]). md5, not
    * a cheaper 64-bit hash, because the SQL oracle must compute the
    * IDENTICAL fingerprint — and 128 bits keeps corpus-scale collision
    * probability negligible where 64 bits would not. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 50, minCount: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = col("ws") // materialized below — see shinglesFromWords caveat
    val grams = transform(
      sequence(lit(0), (size(ws) - windowTokens).cast("int")),
      i => md5(concat_ws(" ", slice(ws, i + 1, lit(windowTokens))).cast("binary")))
    val positions = docs
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("ws"))
      .where(size(ws) >= windowTokens)
      .select(col("doc_id"), posexplode(grams).as(Seq("pos", "fp")))
      .persist()
    registerCache(positions)
    val dupGrams = positions.groupBy("fp")
      .agg(count(lit(1)).as("n")).where(col("n") >= minCount)
      .select("fp")
    val dupPos = positions.join(dupGrams, Seq("fp"), "left_semi")
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    dupPos.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("start_pos"),
        (max("pos") + windowTokens).as("end_pos"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "start_pos", "end_pos", "n_windows")
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word 4-shingles (Charikar 2002 / Manku et al. 2007):
    * each shingle's 64-bit hash votes ±1 per bit position; the signature is
    * the sign vector. Near-dups have small Hamming distance. */
  def simhash64(text: String, k: Int = 4): Long = {
    val ws = text.trim.split("\\s+")
    if (ws.length < k) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i <= ws.length - k) {
      var h = 0xcbf29ce484222325L // FNV offset
      var j = i
      while (j < i + k) {
        var w = 0
        val s = ws(j)
        while (w < s.length) { h = (h ^ s.charAt(w)) * 0x100000001b3L; w += 1 }
        h = (h ^ ' ') * 0x100000001b3L
        j += 1
      }
      // finalize (murmur-style mix)
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Per-doc SimHash signatures — computed by the native
    * [[graft.functions.SimHash64Expr]] codegen expression, so the scan →
    * signature projection is one WholeStageCodegen span (the previous typed
    * `map` deserialized every row to a (Long, String) tuple and back). */
  def simhashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.select(col(idCol).cast("long").as("id"),
      GraftColumnBridge.column(
        graft.functions.SimHash64Expr(GraftColumnBridge.expression(col(textCol)))).as("simhash"))
  }

  /** Pairs with Hamming distance ≤ maxDist, via the pigeonhole band trick:
    * split 64 bits into (maxDist+1) bands — any pair within maxDist matches
    * exactly on ≥1 band — join per band, verify Hamming on candidates.
    * Band buckets hotter than `maxBucket` are dropped first (degenerate
    * exact-copy clusters belong to [[exactGroups]]; same rationale as
    * [[minhashCandidates]]). */
  def simhashPairs(sigs: DataFrame, maxDist: Int = 3,
      maxBucket: Int = MaxBucket): DataFrame = {
    val bands = maxDist + 1
    val width = 64 / bands
    val banded0 = sigs.select(col("id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.key"))
    val banded = dropHotKeysCached(banded0, maxBucket, "band", "key")
    val popcnt = (x: Column) => bit_count(x)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .where(popcnt(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }
}
