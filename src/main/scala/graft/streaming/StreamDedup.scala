package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class FingerprintedDoc(fp: String, url: String, text: String)

/** Streaming exact-dedup: keep only the FIRST document ever seen for each
  * fingerprint, across micro-batches — `groupByKey(fp)` +
  * `flatMapGroupsWithState`, the custom-state primitive for continuous
  * ingest (an arriving re-crawl of an already-ingested page emits nothing).
  *
  * State is one boolean per distinct fingerprint, hash-partitioned by the
  * state store — at web scale pair this with a TTL/watermark policy
  * (GroupStateTimeout.ProcessingTimeTimeout) so the store holds only the
  * retention window; kept NoTimeout here because the sandbox corpus is
  * bounded. */
object StreamDedup {

  def firstSeenOnly(docs: Dataset[FingerprintedDoc]): Dataset[FingerprintedDoc] = {
    implicit val enc = Encoders.product[FingerprintedDoc]
    implicit val senc = Encoders.scalaBoolean
    docs.groupByKey(_.fp)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, FingerprintedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[FingerprintedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }
}
