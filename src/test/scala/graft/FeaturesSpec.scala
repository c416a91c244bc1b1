package graft

import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {

  test("decile bins cover 0..9 with ~10% mass each and are monotone in value") {
    val bins = SparkEntry.queries("q_feature_bins")(spark, sfDir)
    val n = bins.count()
    val byBin = bins.groupBy("bin").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBin.keySet == (0L to 9L).toSet, s"bins present: ${byBin.keySet}")
    byBin.values.foreach(c => assert(c >= n / 20 && c <= n / 5, s"decile far off 10%: $c of $n"))
    // monotone: the max value of bin b is <= min value of bin b+1
    val stats = bins.groupBy("bin").agg(min("value").as("mn"), max("value").as("mx"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
    val bad = stats.withColumn("next_mn", lead("mn", 1).over(w))
      .filter(col("next_mn").isNotNull && col("mx") > col("next_mn"))
    assert(bad.count() == 0, "bin ranges must not overlap")
  }

  test("stratified sample keeps ~rate% per stratum, deterministically") {
    val s = SparkEntry.queries("q_stratified_sample")(spark, sfDir)
    val totals = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, n) <- totals) {
      val rate = if (t == "view" || t == "click") 0.20 else 0.80
      val frac = kept.getOrElse(t, 0L).toDouble / n
      assert(math.abs(frac - rate) < 0.08, s"$t kept $frac, wanted ~$rate")
    }
    // deterministic: the same rows are kept on every run
    val again = SparkEntry.queries("q_stratified_sample")(spark, sfDir)
    assert(s.exceptAll(again).count() == 0)
  }

  test("session stats conserve the per-user event count") {
    val stats = SparkEntry.queries("q_session_stats")(spark, sfDir)
    val events = Tables.events(spark, sfDir).groupBy("user_id").count()
    // avg_session_events * n_sessions must recover the user's event
    // count (round4 tolerance), and the max can't exceed the total.
    val bad = stats.join(events, "user_id").filter(
      abs(col("avg_session_events") * col("n_sessions") - col("count")) > col("n_sessions") * 0.0001 ||
        col("max_session_events") > col("count"))
    assert(bad.count() == 0)
    assert(stats.count() == events.count(), "every user has session stats")
  }

  test("exact-sum correlation matches Spark's float corr to 1e-3 and stays in [-1,1]") {
    val m = SparkEntry.queries("q_corr_matrix")(spark, sfDir).collect()(0)
    val li = Tables.lineitem(spark, sfDir)
    val ref = li.agg(
      corr("l_quantity", "l_extendedprice"),
      corr("l_quantity", "l_discount"),
      corr("l_extendedprice", "l_discount")).collect()(0)
    for ((name, refIdx) <- Seq(("corr_qty_price", 0), ("corr_qty_disc", 1), ("corr_price_disc", 2))) {
      val v = m.getAs[Double](name)
      assert(v >= -1.0 && v <= 1.0, s"$name out of range: $v")
      // scaled-int correlation differs from the raw-double one only by
      // the 2-decimal quantization, far inside 1e-3 here
      assert(math.abs(v - ref.getDouble(refIdx)) < 1e-3, s"$name: $v vs ${ref.getDouble(refIdx)}")
    }
  }

  test("statsMerge equals the direct single-pass aggregation exactly") {
    import org.apache.spark.sql.functions._
    val direct = Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("len"))
      .groupBy("source").agg(
        count(lit(1)).as("n"), sum("len").as("total_len"),
        min("len").as("min_len"), max("len").as("max_len"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val merged = SparkEntry.queries("q_stats_merge")(spark, sfDir)
      .select("source", "n", "total_len", "min_len", "max_len")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(merged == direct, "partial-state merge diverges from the direct aggregation")
    // variance is non-negative and mean sits inside [min, max]
    val full = SparkEntry.queries("q_stats_merge")(spark, sfDir).collect()
    full.foreach { r =>
      assert(r.getDouble(6) >= 0.0, s"negative variance: $r")
      assert(r.getDouble(5) >= r.getLong(3) && r.getDouble(5) <= r.getLong(4), s"mean outside [min,max]: $r")
    }
  }
}
