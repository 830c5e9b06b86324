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
          val seen = mutable.ArrayBuffer.from(state.getOption.map(_.ids).getOrElse(Nil))
          val out = mutable.ArrayBuffer.empty[CandidatePair]
          rows.foreach { r =>
            if (!seen.contains(r.id) && seen.length < maxBucket) {
              seen.foreach { prev =>
                out += CandidatePair(math.min(prev, r.id), math.max(prev, r.id))
              }
              seen += r.id
            }
          }
          state.update(BucketState(seen.toSeq))
          out.iterator
      }
  }
}
