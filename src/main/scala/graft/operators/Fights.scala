package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fight attribution: the range join that MERGES attributes of nearby
  * events (not just counts them), plus the conditional aggregation that
  * consumes the merged result.
  *
  * Reference: parse_fights_one_game (utils.py:541-580) back-fills each
  * kill event with enemies/victims taken from OTHER kill events within
  * ±15 s, and calc_participant_aggressiveness_and_judgment (utils.py:630)
  * then folds the merged fights into solo/skirmish/team win-loss ratios.
  *
  * Same bucketed equi-join shape as RangeJoin (bucket + explode-to-3 —
  * no theta join), but the aggregation carries attribute merges
  * (count/max/sum of the joined side).
  */
object Fights {
  val WindowMicros: Long = 15L * 60 * 1000 * 1000

  /** Anchor ('error') events joined to that user's 'click' events within
    * ±W via the bucketed equi-join — the shared front half of both
    * operators below. Columns: a_id, a_user, a_value, c_ts, c_value.
    */
  private def anchorClickPairs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val anchors = Tables
      .events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        unix_micros(col("ts")).as("a_ts"), col("value").as("a_value"))
      .withColumn("bucket", floor(col("a_ts") / WindowMicros).cast("long"))

    val nearby = Tables
      .events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts"), col("value").as("c_value"))
      .withColumn("b0", floor(col("c_ts") / WindowMicros).cast("long"))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
      .drop("b0")

    val pairs = anchors
      .join(nearby, col("a_user") === col("c_user") && anchors("bucket") === nearby("bucket"))
      .filter(col("c_ts") >= col("a_ts") - WindowMicros && col("c_ts") <= col("a_ts") + WindowMicros)
    (anchors, pairs)
  }

  /** Per anchor (error event): merged attributes of that user's 'click'
    * events within ±15 min — involvement count, peak and total value.
    */
  def attrMerge(spark: SparkSession, dir: String): DataFrame = {
    val (anchors, pairs) = anchorClickPairs(spark, dir)
    val merged = pairs
      .groupBy(col("a_id"))
      .agg(
        count(lit(1)).as("n_clicks"),
        Num.round4(max(col("c_value"))).as("max_click"),
        Num.round4(sum(col("c_value"))).as("sum_click")
      )

    anchors
      .select(col("a_id").as("event_id"), col("a_user").as("user_id"))
      .join(merged.withColumnRenamed("a_id", "event_id"), Seq("event_id"), "left")
      .select(
        col("event_id"),
        col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        col("max_click"),
        col("sum_click")
      )
      // sortedOutput (r19): the final sort's range-sampling pass re-ran
      // the sort-merge join; staging bounds it to a cache read.
      .transform(df => graft.Staging.sortedOutput(df, "range_attr_merge_out", "event_id"))
  }

  /** Downstream conditional aggregation over the merged fights: per user,
    * solo (no nearby involvement) / skirmish (1-3) / team (4+) error
    * counts and their "win" splits (value >= 100), the exact shape of the
    * reference's aggressiveness/judgment ratios.
    */
  def outcomes(spark: SparkSession, dir: String): DataFrame = {
    val (anchors, pairs) = anchorClickPairs(spark, dir)
    val counts = pairs.groupBy(col("a_id")).agg(count(lit(1)).as("n_clicks"))

    val fights = anchors
      .select(col("a_id"), col("a_user"), col("a_value"))
      .join(counts, Seq("a_id"), "left")
      .withColumn("n_clicks", coalesce(col("n_clicks"), lit(0L)))
      .withColumn("kind",
        when(col("n_clicks") === 0, "solo")
          .when(col("n_clicks") <= 3, "skirmish")
          .otherwise("team"))
      .withColumn("win", when(col("a_value") >= 100, 1L).otherwise(0L))

    fights
      .groupBy(col("a_user").as("user_id"))
      .agg(
        sum(when(col("kind") === "solo", 1L).otherwise(0L)).as("solo_n"),
        sum(when(col("kind") === "solo", col("win")).otherwise(0L)).as("solo_wins"),
        sum(when(col("kind") === "skirmish", 1L).otherwise(0L)).as("skirmish_n"),
        sum(when(col("kind") === "skirmish", col("win")).otherwise(0L)).as("skirmish_wins"),
        sum(when(col("kind") === "team", 1L).otherwise(0L)).as("team_n"),
        sum(when(col("kind") === "team", col("win")).otherwise(0L)).as("team_wins")
      )
      .orderBy("user_id")
  }
}
