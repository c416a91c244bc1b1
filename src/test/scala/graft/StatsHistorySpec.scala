package graft

import org.apache.spark.sql.functions._

class StatsHistorySpec extends SparkSpec {

  test("stats composite covers every (user, lane) and accounts for all events") {
    val c = SparkEntry.queries("q_stats_history_composite")(spark, sfDir)
    val nEvents = Tables.events(spark, sfDir).count()
    assert(c.agg(sum("n_events")).collect()(0).getLong(0) == nEvents)
    // lane_rank is a dense 1..k permutation per user
    val ranks = c.groupBy("user_id").agg(count(lit(1)).as("k"), max("lane_rank").as("mx"), min("lane_rank").as("mn"))
    assert(ranks.filter(col("mx") =!= col("k") || col("mn") =!= 1).count() == 0)
  }

  test("current streak is consistent with the q_streaks maxima") {
    val c = SparkEntry.queries("q_stats_history_composite")(spark, sfDir)
      .select("user_id", "cur_streak_len", "cur_streak_win").distinct()
    val s = SparkEntry.queries("q_streaks")(spark, sfDir)
    val bad = c.join(s, "user_id")
      .filter(
        (col("cur_streak_win") === 1 && col("cur_streak_len") > col("max_win_streak")) ||
          (col("cur_streak_win") === 0 && col("cur_streak_len") > col("max_loss_streak")))
    assert(bad.count() == 0, "current streak exceeds the historical maximum for its kind")
    assert(c.filter(col("cur_streak_len") < 1).count() == 0, "a user's latest event always starts a streak of >= 1")
  }
}
