package graft.streaming

import graft.sources.{ParquetSink, ScdHistory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD-2 dimension maintenance: micro-batches of change
  * events fold into the versioned history via foreachBatch +
  * ScdHistory.applyUpdates — the streaming twin of the reference's
  * periodic dim re-fetch loop (periodical_static_data_gathering.py runs
  * on a timer; this reacts to the change stream instead).
  *
  * State lives in the LAKE, not executor memory: each micro-batch
  * rebuilds only the keys it touches (applyUpdates' semi/anti split),
  * so a quiet dim with millions of keys costs per-batch work
  * proportional to the batch. Durability: the merged history commits
  * via ParquetSink.swapIn (staged write + rename — the previous history
  * is never deleted before its replacement is fully written), reads
  * resolve a crash-interrupted swap via resolveCurrent, and
  * applyUpdates' idempotence makes batch replay after a restart safe
  * (exactly-once effect from at-least-once delivery) — provided the
  * caller passes a real `checkpointDir` so source offsets survive the
  * process (a temp checkpoint dies with it).
  */
object ScdStream {

  /** Start maintaining `path` from a streaming frame of
    * (keyCols..., valueCol, ts_ms) change events.
    *
    * @param checkpointDir durable location for source offsets; None
    *                      (tests only) falls back to a temp checkpoint
    *                      that does not survive a restart
    */
  def maintain(
      updates: DataFrame,
      path: String,
      keyCols: Seq[String],
      valueCol: String,
      checkpointDir: Option[String] = None
  ): StreamingQuery = {
    val writer = updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val current = ParquetSink.resolveCurrent(spark, path)
        val existing =
          if (ParquetSink.pathExists(spark, current)) spark.read.parquet(current)
          else ScdHistory.fromEvents(batch.limit(0), keyCols, valueCol, "ts_ms")
        ParquetSink.swapIn(spark, path,
          ScdHistory.applyUpdates(existing, batch, keyCols, valueCol))
        ()
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }
}
