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
}
