package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths, per the scale playbook:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query side is broadcast (it is k·queries rows), so the "join" is a
  *    map-side nested loop over a handful of broadcast vectors: no shuffle
  *    of the big side at all; cost O(N·Q·d) flops, embarrassingly parallel.
  *  - [[ivfTopK]]: IVF-style two-level search — a coarse quantizer (centroid
  *    set) partitions the corpus; queries probe only the `nprobe` nearest
  *    cells. At 100 TB the cell assignment is the partitioning/bucketing key
  *    of the stored table, so a query touches nprobe/ncells of the data.
  *
  * Cosines are computed in DOUBLE over the float inputs with strict
  * left-to-right accumulation (`aggregate`/`zip_with` — codegen'd, no UDF),
  * which both keeps the plan in whole-stage codegen and makes the value
  * engine-portable (the DuckDB oracle computes the same double sums).
  */
object Ann {

  /** Dot product of two ARRAY<FLOAT> columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors by cosine for each query vector.
    * `queries`/`corpus`: (id, embedding). Self-pairs excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c").join(
      broadcast(queries.as("q")), col("q.id") =!= col("c.id"))
      .select(
        col("q.id").as("query_id"),
        col("c.id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Assign every corpus vector to its `n` nearest centroids (cosine,
    * deterministic tie-break on centroid id). Centroids are broadcast; the
    * per-vector top-n is a `row_number` window, which Spark plans with a
    * partial WindowGroupLimit before the exchange — the shuffle carries at
    * most n rows per vector per map partition. */
  def assignTopN(corpus: DataFrame, centroids: DataFrame, n: Int): DataFrame = {
    val scored = corpus.as("v").join(broadcast(centroids.as("ct")))
      .select(col("v.id").as("id"), col("v.embedding").as("embedding"),
        col("ct.id").as("cid"),
        cosine(col("v.embedding"), col("ct.embedding")).as("cos"))
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= n)
      .select(col("id"), col("embedding"), col("cid"))
  }

  /** Assign every corpus vector to its nearest centroid (argmax cosine,
    * deterministic tie-break on centroid id). Centroids are broadcast. */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignTopN(corpus, centroids, 1)

  /** IVF search: probe the `nprobe` nearest cells per query, exact top-k
    * within the probed cells. Returns (query_id, rank, neighbor_id). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val assigned = assign(corpus, centroids)
    val qProbe = {
      val scored = queries.as("q").join(broadcast(centroids.as("ct")))
        .select(col("q.id").as("query_id"), col("q.embedding").as("qemb"),
          col("ct.id").as("cid"),
          cosine(col("q.embedding"), col("ct.embedding")).as("cos"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cid"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= nprobe)
        .select(col("query_id"), col("qemb"), col("cid"))
    }
    val scored = assigned.join(broadcast(qProbe), Seq("cid"))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qemb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Deterministic spherical k-means for the IVF coarse quantizer: seed
    * centroids are the k corpus vectors with the smallest Knuth-hash bucket
    * (reproducible, no RNG), then `iters` Lloyd rounds — assign by cosine
    * (broadcast centroids, narrow map) and recompute centroids as the
    * element-wise mean (posexplode → one shuffle per round keyed by
    * (cid, dim): fully parallel, no driver-side math). */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val seed = corpus
      .orderBy(graft.functions.Sampling.orderKey(col("id")), col("id"))
      .limit(k)
      .select(row_number().over(Window.orderBy(col("id"))).cast("long").as("id"),
        col("embedding"))
    var centroids = seed
    var prevCache: DataFrame = null
    try {
      for (_ <- 1 to iters) {
        val assigned = assign(corpus, centroids)
        val next = assigned
          .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("cid", "pos")
          .agg(avg(col("v").cast("double")).as("m"))
          .groupBy(col("cid").as("id"))
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
          .select(col("id"),
            transform(col("pairs"), p => p.getField("m").cast("float")).as("embedding"))
          // materialize each round (k rows — tiny): without the persist,
          // round i's plan NESTS rounds 1..i-1, so a realistic quantizer
          // build (iters 10-25) hands Catalyst an exponentially growing tree
          // and re-executes every prior round per action. Same persist/release
          // discipline as the CC loop (Dedup.connectedComponents).
          .persist()
        try next.count()
        catch { case t: Throwable =>
          try next.unpersist() catch { case _: Exception => () }
          throw t
        }
        if (prevCache != null) prevCache.unpersist()
        prevCache = next
        centroids = next
      }
    } catch {
      // a failed round (executor loss, OOM) must not leak the in-flight
      // caches: they are not yet registered with the lifecycle
      case t: Throwable =>
        if (prevCache != null) {
          try prevCache.unpersist() catch { case _: Exception => () }
        }
        throw t
    }
    // the final round's cache (k rows) backs the returned frame; register it
    // with the operator-cache lifecycle so Dedup.clearCaches() releases it.
    // Callers looping over many quantizer builds in one session should
    // clearCaches() between jobs — each build retains one k-row cache until
    // then (registration is what makes the release possible at all).
    if (prevCache != null) graft.dedup.Dedup.registerCache(prevCache)
    centroids
  }

  /** Symmetric per-vector int8 scalar quantization — the 4× storage
    * compression step for a 100 TB embedding table (store (id, scale,
    * int8[]); dequantize as q·maxabs/127 at search time). Output is the
    * exploded (id, pos, qval) form in BIGINT so any engine reproduces it
    * bit-exactly: all arithmetic is IEEE double with a fixed operation
    * order, round-half-up via floor(v + 0.5). Codegen'd higher-order
    * functions, no UDF. */
  def quantizeInt8(vectors: DataFrame): DataFrame =
    vectors
      .select(col("id"), col("embedding"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double")))).as("maxabs"))
      .select(col("id"), col("maxabs"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        when(col("maxabs") === 0.0, lit(0L))
          .otherwise(floor(col("x").cast("double") * 127.0 / col("maxabs") + 0.5).cast("long"))
          .as("qval"))

  /** SQ8 two-stage search: coarse candidate generation over int8-quantized
    * vectors, exact-cosine re-rank of the per-query `pool` to the final
    * top-`k`. This is the 100 TB search shape: the coarse scan reads only
    * the quantized table (4× smaller, integer MACs the JIT vectorizes),
    * and the full-precision floats are fetched by equi-join for at most
    * pool·|queries| rows — the big float table is never broadcast or
    * re-scored in full.
    *
    * The coarse score is the RAW quantized dot product — deliberately
    * unnormalized: the per-vector scale (maxabs/127) and norm are positive
    * constants that the exact re-rank applies anyway, and leaving them out
    * keeps the coarse stage in exact integer arithmetic, so the candidate
    * set is bit-reproducible across engines (no float ulp at the pool
    * boundary; the only cross-engine doubles are in the re-rank cosine).
    * Recall vs exact top-k is an empirical property ([[graft.AnnSpec]]);
    * with pool ≥ |corpus| the result equals [[bruteForceTopK]] by
    * construction. Quantization arithmetic is the same fixed-order IEEE
    * chain as [[quantizeInt8]]. */
  def quantizedRerankTopK(corpus: DataFrame, queries: DataFrame,
      k: Int, pool: Int): DataFrame = {
    require(pool >= k, s"pool $pool must be >= k $k")
    def quantized(df: DataFrame): DataFrame =
      df.select(col("id"), col("embedding"),
          aggregate(col("embedding"), lit(0.0),
            (acc, x) => greatest(acc, abs(x.cast("double")))).as("maxabs"))
        .select(col("id"), col("embedding"),
          transform(col("embedding"), x =>
            when(col("maxabs") === 0.0, lit(0L))
              .otherwise(floor(x.cast("double") * 127.0 / col("maxabs") + 0.5)))
            .as("qvec"))
    val c = quantized(corpus).select(col("id"), col("qvec"))
    val q = quantized(queries).select(col("id").as("query_id"),
      col("embedding").as("qemb"), col("qvec").as("qq"))
    val idot = aggregate(zip_with(col("qq"), col("qvec"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val wCoarse = Window.partitionBy("query_id").orderBy(col("idot").desc, col("id"))
    val cand = c.join(broadcast(q), col("query_id") =!= col("id"))
      .select(col("query_id"), col("qemb"), col("id"), idot.as("idot"))
      .withColumn("rn", row_number().over(wCoarse)).where(col("rn") <= pool)
      .select(col("query_id"), col("qemb"), col("id"))
    val rerank = cand.join(corpus.select(col("id"), col("embedding")), Seq("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qemb"), col("embedding")).as("cos"))
    val wExact = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    rerank.withColumn("rank", row_number().over(wExact).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  // ------------------------------------------- random-hyperplane (cosine) LSH

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** `nBits`-bit random-hyperplane signature (Charikar 2002) as nBits/64
    * longs: bit p = sign of ⟨v, r_p⟩ where r_p is a deterministic
    * Rademacher (±1) vector derived from a SplitMix64 hash of (p, dim) —
    * no RNG state, identical on every executor. P[bit differs] = θ/π. */
  def rpSignature(v: Array[Float], nBits: Int): Array[Long] = {
    require(nBits % 64 == 0, s"nBits $nBits must be a multiple of 64")
    val sig = new Array[Long](nBits / 64)
    var p = 0
    while (p < nBits) {
      var acc = 0.0
      var d = 0
      while (d < v.length) {
        val h = mix64(p.toLong * 0x100000001b3L + d)
        acc += (if ((h & 1L) == 1L) v(d) else -v(d))
        d += 1
      }
      if (acc > 0) sig(p >> 6) |= 1L << (p & 63)
      p += 1
    }
    sig
  }

  /** (id, sig ARRAY<BIGINT>) random-hyperplane signatures. */
  def rpSignatures(vectors: DataFrame, nBits: Int = 256): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, rpSignature(v, nBits)) }
      .toDF("id", "sig")
  }

  /** Embedding near-dup pairs via WIDE-BAND random-hyperplane LSH + exact
    * cosine verification — the quantizer-free scale path when no IVF index
    * exists. The signature is sliced into `bands` bands of nBits/bands bits;
    * a pair is a candidate iff some band matches exactly (banded equi-join,
    * hot buckets capped).
    *
    * Design point (vs the pigeonhole Hamming trick, which is WRONG here at
    * scale: 64/(maxDist+1)-bit keys give a few hundred buckets, so every
    * bucket blows the hot cap on a large corpus): band keys must carry
    * enough bits that E[bucket] = N/2^bandBits stays under `maxBucket` —
    * with the 16-bit default that holds to N ≈ 65M vectors; use
    * nBits=512/bands=16 (32-bit keys) beyond. Recall is
    * 1-(1-(1-θ/π)^bandBits)^bands: ≈ 0.96 at cosine 0.95 with 16×16, and
    * exact copies match every band regardless. The verification predicate
    * is exact, so precision is exact. */
  def rplshCosineDupPairs(vectors: DataFrame, threshold: Double,
      nBits: Int = 256, bands: Int = 16,
      maxBucket: Int = graft.dedup.Dedup.MaxBucket): DataFrame = {
    val (banded, _) = rpBandRows(vectors, nBits, bands, maxBucket)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyCosine(cand, vectors, threshold)
  }

  /** Multi-probe variant of [[rplshCosineDupPairs]]: one join side
    * additionally probes every Hamming-distance-1 key in each band, so a
    * pair is a candidate iff some band's keys differ in AT MOST ONE bit.
    * This is the probing-sequence idea of multi-probe LSH (Lv et al., VLDB
    * 2007 — query several near buckets instead of building more tables)
    * specialized to the self-join: per-band collision probability rises
    * from p^r to p^r + r·p^(r-1)(1-p), which at cosine 0.9 with 4×16-bit
    * bands lifts analytic recall ~0.30 → ~0.77 while keeping ONE signature
    * and ONE equi-join. Cost: the probe side explodes bandBits+1 rows per
    * band row (17× at 16-bit bands) — cheaper than the 16× extra bands the
    * same recall would otherwise need, because only the narrow (id, band,
    * key) index grows, never the vectors, and the verify stage is
    * unchanged. Probing is one-sided (original keys × probed keys), which
    * covers the distance-≤1 relation exactly once before `distinct`. The
    * hot-key cap applies to the ORIGINAL buckets; a probed bucket's join
    * fan-in is therefore ≤ (bandBits+1)·maxBucket. */
  def rplshCosineDupPairsMultiProbe(vectors: DataFrame, threshold: Double,
      nBits: Int = 64, bands: Int = 4,
      maxBucket: Int = graft.dedup.Dedup.MaxBucket): DataFrame = {
    val (banded, bandBits) = rpBandRows(vectors, nBits, bands, maxBucket)
    val flips = (0 until bandBits).map(i => col("key").bitwiseXOR(lit(1L << i)))
    val probed = banded.select(col("id"), col("band"),
      explode(array(col("key") +: flips: _*)).as("key"))
    val cand = banded.as("a").join(probed.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyCosine(cand, vectors, threshold)
  }

  /** Banded RP-LSH index rows (id, band, key), hot buckets dropped;
    * returns the band width alongside. Shared by the single- and
    * multi-probe pair generators. */
  private def rpBandRows(vectors: DataFrame, nBits: Int, bands: Int,
      maxBucket: Int): (DataFrame, Int) = {
    require(bands > 0 && nBits % bands == 0,
      s"bands $bands must divide nBits $nBits")
    val bandBits = nBits / bands
    require(bandBits > 0 && bandBits <= 64 && 64 % bandBits == 0,
      s"band width $bandBits must be in 1..64 and divide 64")
    val sigs = rpSignatures(vectors, nBits)
    val banded0 = sigs.select(col("id"),
      explode(array((0 until bands).map { b =>
        val word = (b * bandBits) / 64
        val off = (b * bandBits) % 64
        struct(lit(b).as("band"),
          shiftrightunsigned(element_at(col("sig"), word + 1), off)
            .bitwiseAND(lit(if (bandBits == 64) -1L else (1L << bandBits) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    (graft.dedup.Dedup.dropHotKeysCached(banded0, maxBucket, "band", "key"),
      bandBits)
  }

  /** Exact-cosine verification of candidate pairs — precision is exact no
    * matter how the candidates were generated. */
  private def verifyCosine(cand: DataFrame, vectors: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(vectors.select(col("id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(vectors.select(col("id").as("id_b"), col("embedding").as("eb")), "id_b")
      .where(cosine(col("ea"), col("eb")) >= threshold)
      .select(col("id_a"), col("id_b"))

  /** APPROXIMATE embedding-cosine near-duplicate pairs (cosine ≥ threshold,
    * a<b), computed IVF-cell-locally: vectors are assigned to their `nprobe`
    * nearest cells of a deterministic spherical-k-means quantizer, and the
    * pair predicate runs as a self-EQUI-join on the cell id. No all-pairs
    * product, no full-table broadcast: the join shuffles on `cid`, so the
    * work is Σ_cells |cell|·nprobe choose 2 instead of N², and the memory
    * profile is one cell per task, not the whole table on the driver.
    *
    * Recall (the name says Ivf so callers opt into this explicitly): a pair
    * is emitted iff the two vectors share at least one of their nprobe
    * nearest cells AND their exact cosine clears the threshold (the
    * predicate is exact — cells only gate candidates). Exact duplicates
    * always share all cells; near-dups at threshold θ share a cell with
    * probability → 1 as θ → 1; raise `nprobe` to trade compute for boundary
    * recall ([[AnnSpec]] carries a brute-force-vs-IVF recall property at
    * θ=0.9). For guaranteed recall on a bounded corpus use
    * [[cosineDupPairsExact]]; for LSH-gated recall at scale use
    * [[rplshCosineDupPairs]]. */
  def cosineDupPairsIvf(vectors: DataFrame, threshold: Double,
      numCells: Int = 16, nprobe: Int = 2, iters: Int = 2): DataFrame = {
    val probed = assignTopN(vectors, kmeansCentroids(vectors, numCells, iters), nprobe)
    probed.as("a").join(probed.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .where(cosine(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** EXACT embedding-cosine near-duplicate pairs: the full O(N²/2) pair
    * product with the exact cosine predicate — 100% recall by construction.
    * This is a deliberate cartesian (Spark plans a BroadcastNestedLoopJoin /
    * CartesianProduct): correct for bounded corpora (test oracles,
    * per-partition re-verification, ≤10⁵ vectors); at web scale use
    * [[cosineDupPairsIvf]] or [[rplshCosineDupPairs]], which gate the same
    * exact predicate behind sub-quadratic candidate generation. */
  def cosineDupPairsExact(vectors: DataFrame, threshold: Double): DataFrame =
    vectors.as("a").join(vectors.as("b"), col("a.id") < col("b.id"))
      .where(cosine(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
}
