package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable

final case class BandedDoc(band: Int, bucket: Long, id: Long)
final case class CandidatePair(id_a: Long, id_b: Long)
final case class BucketState(ids: Seq[Long])

/** Streaming MinHash-LSH near-duplicate detection for continuous ingest:
  * each arriving document's 128-hash signature is banded exactly like the
  * batch path ([[Dedup.minhashBands]]), and a stateful
  * `flatMapGroupsWithState` keyed by (band, bucket) emits a candidate pair
  * against every PREVIOUSLY-seen member of the bucket — so near-dups are
  * flagged the moment the second copy arrives, across micro-batches.
  * Downstream, the batch exact-verify stage
  * ([[Dedup.minhashDedupPairs]]'s second half) runs over the emitted
  * candidates.
  *
  * Scale notes: state per (band, bucket) is the member id list, capped at
  * `maxBucket` ids — a degenerate bucket stops ACCUMULATING past the cap
  * (prefix-of-stream semantics; the batch path drops such buckets wholesale
  * — the same "exact-dedup giant clusters first" policy applies). Pair the
  * state with a TTL (`GroupStateTimeout.ProcessingTimeTimeout`) when the
  * dedup window is bounded; NoTimeout here as the sandbox corpus is finite.
  * The same pair can surface from several bands — run `.distinct()` (or the
  * exact verify, which is idempotent) downstream. */
object StreamMinhash {

  /** Band rows of a (doc_id, text) stream — the streaming twin of
    * [[Dedup.minhashBands]]; pure narrow map, no state. */
  def bandedStream(docs: Dataset[(Long, String)], k: Int = 3): Dataset[BandedDoc] = {
    implicit val enc = Encoders.product[BandedDoc]
    docs.flatMap { case (id, text) =>
      val hs = Dedup.shingleHashes(text, k)
      if (!hs.hasNext) Iterator.empty
      else {
        val sig = Dedup.minhashSignature(hs)
        (0 until Dedup.Bands).iterator.map(b => BandedDoc(b, Dedup.bandKey(sig, b), id))
      }
    }
  }

  def candidatePairs(banded: Dataset[BandedDoc],
      maxBucket: Int = Dedup.MaxBucket): Dataset[CandidatePair] = {
    implicit val penc = Encoders.product[CandidatePair]
    implicit val senc = Encoders.product[BucketState]
    banded
      .groupByKey(b => (b.band, b.bucket))(Encoders.product[(Int, Long)])
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          val prior = state.getOption.map(_.ids).getOrElse(Nil)
          val seen = mutable.ArrayBuffer.from(prior)
          // O(1) membership alongside the ordered list (the state encoding
          // stays the Seq; a capped bucket previously paid an O(n) scan per
          // arrival)
          val seenSet = mutable.HashSet.from(prior)
          val out = mutable.ArrayBuffer.empty[CandidatePair]
          rows.foreach { r =>
            if (!seenSet.contains(r.id) && seen.length < maxBucket) {
              seen.foreach { prev =>
                out += CandidatePair(math.min(prev, r.id), math.max(prev, r.id))
              }
              seen += r.id
              seenSet += r.id
            }
          }
          state.update(BucketState(seen.toSeq))
          out.iterator
      }
  }

  /** Batch-parity surface for the driver's correctness gate: run the
    * STREAMING banding transform ([[bandedStream]] — the exact code a
    * `readStream` pipeline executes, same signature fold and band keys)
    * over a batch corpus, bucket-join the band rows into the candidate set
    * a completed stream would have emitted (over a finished stream the
    * stateful operator emits every within-bucket pair, modulo the cap — the
    * batch [[Dedup.minhashCandidates]] computes the same set), and
    * exact-Jaccard-verify. The result is oracled by the same exact-Jaccard
    * SQL as `dedup_minhash_lsh`, giving the streaming code path driver-gate
    * evidence (the stateful cross-micro-batch behavior itself is covered by
    * PipelineSpec's streaming-vs-batch candidate-set test). */
  def batchParityPairs(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8,
      maxBucket: Int = Dedup.MaxBucket): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val banded = bandedStream(
      docs.select(col(idCol).cast("long"), col(textCol).cast("string")).as[(Long, String)], k)
    Dedup.verifyCandidatesExact(docs, idCol, textCol,
      Dedup.minhashCandidates(banded.toDF(), maxBucket), k, threshold, maxBucket)
  }
}
