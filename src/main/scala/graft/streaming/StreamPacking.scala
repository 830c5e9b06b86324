package graft.streaming

import graft.pipeline.Packing
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class PackEvent(stream: Long, doc_id: Long, n_tokens: Long)
final case class PackAssign(doc_id: Long, stream: Long, bin: Long, n_tokens: Long)
/** Open-bin state per stream, carried across micro-batches. */
final case class PackOpenBin(bin: Long, filled: Long)

/** Streaming twin of [[graft.pipeline.Packing.packSequences]] for
  * continuous ingest: a stateful `flatMapGroupsWithState` keyed by the
  * packing stream whose state is the open bin's `(bin, filled)` — each
  * arriving document is assigned the moment it lands, across
  * micro-batches, with the SAME overflow rule ([[Packing.spills]]) as the
  * batch scan.
  *
  * Ordering contract: within one invocation the rows sort by doc_id (the
  * batch operator's order), so results are EXACT when each stream sees
  * doc-id-ordered arrival ACROSS micro-batches (any order within one) —
  * the prefix-of-stream semantics of [[StreamAsof]] and
  * [[StreamMinhash]]. Run in BATCH mode the transform sees each stream
  * once and reproduces `packSequences` row-for-row — asserted by the
  * `pack_sequences_stream_parity` gate query against the identical
  * recursive-CTE oracle.
  *
  * PRECONDITION (as [[StreamAsof]]): `PackEvent` fields are non-null by
  * construction — apply [[Packing]]'s null contract (drop null ids,
  * count null text as empty) before typing the stream. */
object StreamPacking {

  def packStream(events: Dataset[PackEvent],
      capacity: Long = 2048L): Dataset[PackAssign] = {
    implicit val aenc = Encoders.product[PackAssign]
    implicit val senc = Encoders.product[PackOpenBin]
    events
      .groupByKey(_.stream)(Encoders.scalaLong)
      .flatMapGroupsWithState[PackOpenBin, PackAssign](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (stream: Long, rows: Iterator[PackEvent], state: GroupState[PackOpenBin]) =>
          val sorted = rows.toArray.sortBy(_.doc_id)
          var bin = state.getOption.map(_.bin).getOrElse(0L)
          var filled = state.getOption.map(_.filled).getOrElse(0L)
          val out = sorted.map { e =>
            if (Packing.spills(filled, e.n_tokens, capacity)) {
              bin += 1L; filled = 0L
            }
            filled += e.n_tokens
            PackAssign(e.doc_id, stream, bin, e.n_tokens)
          }
          state.update(PackOpenBin(bin, filled))
          out.iterator
      }
  }
}
