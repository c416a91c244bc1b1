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
  * proportional to the batch, and a crash recovers from the sink +
  * checkpointed source offsets. applyUpdates' idempotence makes batch
  * replay after a failure safe (exactly-once effect from at-least-once
  * delivery).
  */
object ScdStream {

  /** Start maintaining `path` from a streaming frame of
    * (keyCols..., valueCol, ts_ms) change events.
    */
  def maintain(
      updates: DataFrame,
      path: String,
      keyCols: Seq[String],
      valueCol: String
  ): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val existing =
          if (ParquetSink.pathExists(spark, path)) spark.read.parquet(path)
          else ScdHistory.fromEvents(batch.limit(0), keyCols, valueCol, "ts_ms")
        val merged = ScdHistory
          .applyUpdates(existing, batch, keyCols, valueCol)
          // barrier: materialize before overwriting what was read
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(path)
        ()
      }
      .start()
}
