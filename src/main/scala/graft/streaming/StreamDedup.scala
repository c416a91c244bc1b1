package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming ingest dedup: drop re-deliveries of the same event id while
  * holding state only inside the watermark horizon — the streaming twin
  * of sources.ParquetSink.upsertByAntiJoin, and the lake answer to the
  * reference's DB unique constraints absorbing API re-fetches
  * (proto_data_gathering re-requests on timeout; the insert is expected
  * to be idempotent).
  *
  * dropDuplicatesWithinWatermark (not plain dropDuplicates) bounds the
  * key state: ids older than the watermark are evicted, so state size is
  * rate × horizon instead of unbounded — the only form that survives an
  * always-on 100 TB/day ingest.
  */
object StreamDedup {
  def dedupe(events: Dataset[SessionEvent], horizon: String = "1 hour"): Dataset[SessionEvent] =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")
}
