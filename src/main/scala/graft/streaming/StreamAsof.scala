package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class AsofEvent(k: Long, ts: java.sql.Timestamp, id: Long, side: Int)
final case class AsofMatch(k: Long, left_id: Long, ts: java.sql.Timestamp,
  asof_id: Option[Long], asof_ts: Option[java.sql.Timestamp])
/** Last right-side row seen for the key, carried across micro-batches
  * (TimestampType state is microsecond-exact — the corpus precision). */
final case class AsofLastRight(id: Long, ts: java.sql.Timestamp)

/** Streaming twin of [[Events.asofJoin]] for continuous ingest: a stateful
  * `flatMapGroupsWithState` keyed by `k` whose state is the last right-side
  * row, so each left event is matched the moment it arrives, across
  * micro-batches — the same per-key O(1) state the batch merge scan
  * carries, made durable.
  *
  * Ordering contract: within one invocation the rows are sorted by
  * (ts, side, id) — the batch operator's exact tie rules — so results are
  * EXACT when keys see event-time-ordered arrival ACROSS micro-batches
  * (any order within a batch); a right row arriving after a later left row
  * was already emitted cannot retro-match it (Append mode emits once).
  * That prefix-of-stream semantics is the same trade
  * [[StreamMinhash.candidatePairs]] documents. Run in BATCH mode the
  * transform sees each key exactly once and reproduces [[Events.asofJoin]]
  * row-for-row — the parity the `events_asof_stream_parity` gate query
  * asserts against the same DuckDB oracle.
  *
  * Unlike the batch operator (external sort, constant memory), the
  * per-invocation sort buffers one key's rows of one micro-batch in the
  * task — bounded by batch sizing in streaming; in batch-parity mode by
  * the key's history (fine at gate scale; the batch operator is the one
  * to run on a full corpus). Pair with a watermark + TTL when the right
  * stream is unbounded.
  *
  * PRECONDITION: `AsofEvent` fields are non-null by construction (typed
  * primitives — a null decodes to a task-killing encoder error, not a
  * wrong answer). Apply [[Events.asofJoin]]'s null contract BEFORE
  * typing the stream: drop null right rows, route null-key/ts left rows
  * around the join as unmatched (the parity gate query does exactly
  * this). */
object StreamAsof {

  def asofStream(events: Dataset[AsofEvent]): Dataset[AsofMatch] = {
    implicit val menc = Encoders.product[AsofMatch]
    implicit val senc = Encoders.product[AsofLastRight]
    events
      .groupByKey(_.k)(Encoders.scalaLong)
      .flatMapGroupsWithState[AsofLastRight, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[AsofEvent], state: GroupState[AsofLastRight]) =>
          val sorted = rows.toArray.sortBy(e =>
            (e.ts.getTime, e.ts.getNanos, e.side, e.id))
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
          sorted.foreach { e =>
            if (e.side == 0) last = Some(AsofLastRight(e.id, e.ts))
            else out += AsofMatch(k, e.id, e.ts, last.map(_.id), last.map(_.ts))
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
