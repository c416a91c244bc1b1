package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window request-rate accounting, streaming-native.
  *
  * Reference: monitor_gathering.py + monitor/views keep rolling request
  * counts per region to respect API rate limits; here the same rates
  * come from a watermarked sliding-window aggregation — partial aggs
  * per micro-batch, state bounded by (windows in watermark horizon ×
  * distinct types), no per-event state.
  */
object RateMonitor {
  /** events must have ts: timestamp and event_type: string. */
  def rates(
      events: DataFrame,
      windowLen: String = "1 minute",
      slide: String = "30 seconds",
      watermark: String = "2 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_requests"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"),
        col("n_requests")
      )
}
