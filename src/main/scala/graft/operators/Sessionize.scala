package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization: a new session starts when the gap to the
  * previous event of the same entity exceeds a threshold. One linear
  * window pass (lag → flag → running sum), partitioned per entity —
  * unlike the reference's O(n^2) in-Python fight merging.
  *
  * Reference: utils.py:586-627 (parse_fights_one_game merges kill events
  * within a 30 s window into one "fight").
  */
object Sessionize {
  val GapMicros: Long = 30L * 60 * 1000 * 1000 // 30 min for the events table

  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runningBrk = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(spark, dir)
      .select("user_id", "ts", "event_id")
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn(
        "brk",
        when(col("ts_us") - lag("ts_us", 1).over(byTime) > GapMicros, 1).otherwise(0)
      )
      .withColumn("session_id", sum("brk").over(runningBrk))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }
}
