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
      // sortedOutput (r19): the groupBy shares the windows' user_id
      // partitioning (no exchange between), so the final sort's
      // range-sampling pass re-ran both window passes; staging bounds
      // it to a cache read (see Windows.runningSum).
      .transform(df => graft.Staging.sortedOutput(df, "sessionize_out", "user_id", "session_id"))
  }

  /** Session-level features rolled up per user: the second stage of the
    * reference's fight analysis (per-fight groups → per-player fight
    * statistics). Same single user_id window pass as `sessions`, one
    * extra (tiny) per-user aggregate on top of the per-session frame —
    * no new fact-table shuffle. Averages use exact integer sums
    * (ms / event counts) so the result is engine- and
    * partitioning-stable.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    // Millisecond grain end-to-end (order, gap, duration) so the oracle
    // computes the identical sessions even when micros differ within a ms.
    val byTime = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val runningBrk = Window
      .partitionBy("user_id")
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perSession = Tables
      .events(spark, dir)
      .select("user_id", "ts", "event_id")
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn(
        "brk",
        when(col("ts_ms") - lag("ts_ms", 1).over(byTime) > GapMicros / 1000, 1).otherwise(0)
      )
      .withColumn("session_id", sum("brk").over(runningBrk))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_ms").as("start_ms"),
        max("ts_ms").as("end_ms"))
    perSession
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        graft.Num.round4(sum("n_events").cast("double") / count(lit(1))).as("avg_session_events"),
        max("n_events").as("max_session_events"),
        graft.Num.round4(sum(col("end_ms") - col("start_ms")).cast("double")
          / (count(lit(1)) * lit(60000.0))).as("avg_session_minutes"))
      .transform(df => graft.Staging.sortedOutput(df, "session_stats_out", "user_id"))
  }
}
