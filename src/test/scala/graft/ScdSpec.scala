package graft

import graft.sources.ScdHistory
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {

  test("scd history intervals partition each user's timeline") {
    val h = SparkEntry.queries("q_scd_history")(spark, sfDir)
    assert(h.count() > 0)
    assert(h.filter(col("valid_from_ms") >= col("valid_to_ms")).count() == 0, "empty/inverted interval")
    // exactly one open (live) version per user
    val open = h.filter(col("valid_to_ms") === ScdHistory.OpenEnd).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1).count() == 0, "each user needs exactly one live version")
    // version n closes exactly where n+1 opens, and no run of equal values
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("version")
    val gaps = h
      .withColumn("next_from", lead("valid_from_ms", 1).over(w))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_from").isNotNull)
    assert(gaps.filter(col("valid_to_ms") =!= col("next_from")).count() == 0, "interval gap/overlap")
    assert(gaps.filter(col("event_type") === col("next_type")).count() == 0, "uncollapsed equal-value run")
  }

  private def eventSlices() = {
    val ev = Tables
      .events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
    val cut = ev.agg(expr("percentile(ts_ms, 0.5)")).collect()(0).getDouble(0).toLong
    (ev, ev.filter(col("ts_ms") <= cut), ev.filter(col("ts_ms") > cut))
  }

  test("applyUpdates of a second batch equals a single full rebuild") {
    val (all, b1, b2) = eventSlices()
    def hist(df: org.apache.spark.sql.DataFrame) =
      ScdHistory.fromEvents(df, Seq("user_id"), "event_type", "ts_ms", Seq("event_type"))
    val full = hist(all).collect().map(_.toSeq).toSet
    val incremental = ScdHistory
      .applyUpdates(hist(b1), b2, Seq("user_id"), "event_type")
      .collect().map(_.toSeq).toSet
    assert(incremental == full, "incremental merge diverged from full rebuild")
  }

  test("streaming SCD maintenance equals the batch rebuild") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (all, b1, b2) = eventSlices()
    val path = java.nio.file.Files.createTempDirectory("graft_scd").toString + "/dim"
    val input = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.ScdStream.maintain(
      input.toDF.toDF("user_id", "event_type", "ts_ms"), path, Seq("user_id"), "event_type")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_type", "ts_ms").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    try {
      input.addData(rows(b1).toIndexedSeq)
      q.processAllAvailable()
      input.addData(rows(b2).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(path).collect().map(_.toSeq).toSet
    val full = ScdHistory
      .fromEvents(all, Seq("user_id"), "event_type", "ts_ms", Seq("event_type"))
      .collect().map(_.toSeq).toSet
    assert(streamed == full, "streamed history diverged from the batch rebuild")
  }

  test("applyUpdates is idempotent: re-applying the same batch is a no-op") {
    val (_, b1, b2) = eventSlices()
    def hist(df: org.apache.spark.sql.DataFrame) =
      ScdHistory.fromEvents(df, Seq("user_id"), "event_type", "ts_ms", Seq("event_type"))
    val once = ScdHistory.applyUpdates(hist(b1), b2, Seq("user_id"), "event_type")
    val twice = ScdHistory.applyUpdates(once, b2, Seq("user_id"), "event_type")
    assert(twice.collect().map(_.toSeq).toSet == once.collect().map(_.toSeq).toSet)
  }

  test("applyUpdates collapses conflicting same-instant events to one max-value version") {
    import spark.implicits._
    val existing = ScdHistory.fromEvents(
      Seq(("u1", "a", 1000L)).toDF("user_id", "event_type", "ts_ms"),
      Seq("user_id"), "event_type", "ts_ms")
    // two repair attempts at the SAME new instant with different values,
    // plus a conflicting value at an EXISTING instant
    val updates = Seq(
      ("u1", "b", 2000L),
      ("u1", "c", 2000L),
      ("u1", "z", 1000L)
    ).toDF("user_id", "event_type", "ts_ms")
    val merged = ScdHistory.applyUpdates(existing, updates, Seq("user_id"), "event_type")
      .orderBy("version")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // per (key, ts) the max value wins: ts=1000 -> z (over a), ts=2000 -> c
    // (over b); versions are contiguous and intervals chain with NO
    // zero-width version.
    assert(merged.toSeq == Seq(
      (1L, "z", 1000L, 2000L),
      (2L, "c", 2000L, ScdHistory.OpenEnd)), s"got ${merged.toSeq}")
    merged.foreach { case (_, _, from, to) => assert(from < to, "zero-width version") }
  }

  test("preferUpdates lets a smaller-value correction win at an existing instant, idempotently") {
    import spark.implicits._
    val existing = ScdHistory.fromEvents(
      Seq(("u1", "z", 1000L)).toDF("user_id", "event_type", "ts_ms"),
      Seq("user_id"), "event_type", "ts_ms")
    // correction at the SAME instant with a SMALLER value: under the
    // default max policy it can never win; with preferUpdates the update
    // batch outranks prior events.
    val fix = Seq(("u1", "a", 1000L)).toDF("user_id", "event_type", "ts_ms")
    val defaulted = ScdHistory.applyUpdates(existing, fix, Seq("user_id"), "event_type")
      .collect().map(r => (r.getString(2), r.getLong(3)))
    assert(defaulted.toSeq == Seq(("z", 1000L)), "max policy keeps the larger value")
    val corrected = ScdHistory.applyUpdates(existing, fix, Seq("user_id"), "event_type", preferUpdates = true)
    assert(corrected.collect().map(r => (r.getString(2), r.getLong(3))).toSeq == Seq(("a", 1000L)))
    // idempotent: re-applying the winning batch changes nothing
    val again = ScdHistory.applyUpdates(corrected, fix, Seq("user_id"), "event_type", preferUpdates = true)
    assert(again.collect().map(_.toSeq).toSet == corrected.collect().map(_.toSeq).toSet)
  }
}
