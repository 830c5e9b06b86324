package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics: one transform shared between batch and Structured
  * Streaming. In streaming mode callers add
  * `.withWatermark("ts", "1 hour")` before [[hourlyByType]] and the same
  * aggregation runs incrementally with state cleanup; in batch mode it is a
  * plain tumbling-window groupBy. Sums are in integer cents
  * (floor(value*100+0.5)) so results are engine-portable and
  * order-insensitive — never hash-compare a float sum. */
object Events {

  /** Gap-based sessionization: `session_window` (5-minute inactivity gap)
    * per user — the streaming-native operator; in batch mode it is the
    * gaps-and-islands computation. */
  def userSessions(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** As-of (temporal) join — an operator Spark has no native form of: for
    * each left row, the right row with the greatest `ts` ≤ the left row's
    * `ts` within the same key (left outer: no prior right row → nulls).
    *
    * NOT expressed as a `left.ts >= right.ts` range join: Catalyst plans
    * that as a broadcast-nested-loop/sort-merge with a per-pair predicate —
    * quadratic in events-per-key. The scalable shape is the classic merge
    * scan: tag both sides, union, ONE shuffle on the key, external sort
    * within partitions by (key, ts, side, id), and a single forward pass
    * carrying O(1) state (the last-seen right row per key). A skewed key
    * streams through one task with constant memory — only Spark's external
    * sort touches disk, never the operator.
    *
    * Tie rules (fixed so any engine reproduces the result): a right row at
    * exactly the left row's `ts` IS visible (≤ semantics; `side` orders
    * right before left at equal ts), and of several right rows sharing the
    * winning ts the largest id wins (sort order makes it the last seen).
    *
    * Output: (key, left_id, ts, asof_id, asof_ts), nullable asof columns.
    *
    * Null handling follows SQL join semantics (NULL equals nothing): a
    * right row with a null key, ts or id can never be referenced as a
    * match and is dropped; a LEFT row with a null key or ts still appears,
    * with null asof columns (its id is payload, not a join field, so a
    * null left id matches normally). Nulls ride THROUGH the merge scan as
    * boxed values (one
    * scan per input — not a separate null branch re-reading the left
    * side); a primitive-tuple encoder would instead silently decode a
    * null key to 0L and MERGE it with the real key 0.
    *
    * The key and id columns must already be integral (the cast to long
    * must be lossless): a string or fractional key would cast to
    * null/truncated and produce silently wrong matches, so that is
    * rejected loudly here instead.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      numPartitions: Int = 32): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    for (df <- Seq(left, right); c <- Seq(keyCol, idCol))
      graft.functions.Sampling.requireIntegral(df, c, "asofJoin")
    def side(df: DataFrame, tag: Int) =
      df.select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("id"), lit(tag).as("side"))
    side(right, 0).unionByName(side(left, 1))
      .as[(Option[Long], Option[java.sql.Timestamp], Option[Long], Int)]
      .repartition(numPartitions, col("k"))
      .sortWithinPartitions("k", "ts", "side", "id")
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var haveKey = false
        var lastId: Option[Long] = None
        var lastTs: Option[java.sql.Timestamp] = None
        it.flatMap { case (kOpt, tsOpt, idOpt, tag) =>
          // null key/ts: unmatched passthrough for left rows, drop for
          // right; a null ID only disqualifies RIGHT rows (a match must be
          // referenceable) — for left rows the id is payload, not a key
          if (kOpt.isEmpty || tsOpt.isEmpty || (tag == 0 && idOpt.isEmpty)) {
            if (tag == 1) Iterator.single((kOpt, idOpt, tsOpt,
              None: Option[Long], None: Option[java.sql.Timestamp]))
            else Iterator.empty
          } else {
            val k = kOpt.get
            if (!haveKey || k != curKey) {
              curKey = k; haveKey = true; lastId = None; lastTs = None
            }
            if (tag == 0) {
              lastId = idOpt; lastTs = tsOpt; Iterator.empty
            } else Iterator.single((kOpt, idOpt, tsOpt, lastId, lastTs))
          }
        }
      }
      .toDF("k", "left_id", "ts", "asof_id", "asof_ts")
      .select(col("k").as(keyCol), col("left_id"), col("ts").as(tsCol),
        col("asof_id"), col("asof_ts"))
  }
}
