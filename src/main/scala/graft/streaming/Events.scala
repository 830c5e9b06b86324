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
