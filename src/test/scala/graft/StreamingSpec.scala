package graft

import graft.streaming.{EventSessionizer, RateMonitor, SessionEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000)

  test("EventSessionizer closes a session when the gap is exceeded") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SessionEvent]
    val sessions = EventSessionizer.sessionize(input.toDS())
    val query = sessions.writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode("append")
      .start()
    try {
      // User 1: events at t=100,105min then a 40min gap (> 30min) at 145.
      // (t=0 would be dropped: event time <= the initial watermark of 0.)
      input.addData(
        SessionEvent(1L, ts(100), 1, 1.0),
        SessionEvent(1L, ts(105), 2, 1.0)
      )
      query.processAllAvailable()
      input.addData(SessionEvent(1L, ts(145), 3, 1.0))
      query.processAllAvailable()
      val out = spark.table("sessions_out").collect()
      assert(out.length == 1, s"expected one closed session, got ${out.toSeq}")
      val r = out.head
      assert(r.getAs[Long]("session_id") == 0)
      assert(r.getAs[Long]("n_events") == 2)
      assert(r.getAs[Long]("start_ms") == 100 * 60 * 1000)
      assert(r.getAs[Long]("end_ms") == 105 * 60 * 1000)
    } finally query.stop()
  }

  test("EventSessionizer flushes idle sessions via the event-time timeout") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SessionEvent]
    val sessions = EventSessionizer.sessionize(input.toDS())
    val query = sessions.writeStream
      .format("memory")
      .queryName("sessions_timeout")
      .outputMode("append")
      .start()
    try {
      input.addData(SessionEvent(7L, ts(100), 1, 1.0))
      query.processAllAvailable()
      // Another user's much-later event pushes the watermark
      // (1h delay + 30min gap) past user 7's timeout.
      input.addData(SessionEvent(8L, ts(400), 2, 1.0))
      query.processAllAvailable()
      input.addData(SessionEvent(8L, ts(401), 3, 1.0))
      query.processAllAvailable()
      val out = spark.table("sessions_timeout").filter(col("user_id") === 7).collect()
      assert(out.length == 1, "idle session must flush on watermark timeout")
      assert(out.head.getAs[Long]("n_events") == 1)
    } finally query.stop()
  }

  test("streaming sessionizer reproduces the batch sessionization exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val events = Tables
      .events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[SessionEvent]
      .collect()
      .toSeq
    val maxTs = events.map(_.ts.getTime).max
    val input = MemoryStream[SessionEvent]
    val query = EventSessionizer.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_equiv").outputMode("append").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      // Sentinel far past every timeout (watermark delay + gap) flushes
      // all real sessions; two triggers so the advanced watermark from
      // the first is applied to timeouts in the second.
      val sentinelTs = new Timestamp(maxTs + 4L * 3600 * 1000)
      input.addData(SessionEvent(-1L, sentinelTs, -1L, 0.0))
      query.processAllAvailable()
      input.addData(SessionEvent(-1L, new Timestamp(sentinelTs.getTime + 1000), -2L, 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sessions_equiv")
        .filter(col("user_id") >= 0)
        .select("user_id", "session_id", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = SparkEntry.queries("q_sessionize")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"streaming/batch mismatch: only-streamed=${streamed.diff(batch).take(5)} only-batch=${batch.diff(streamed).take(5)}")
    } finally query.stop()
  }

  test("streaming dedup drops re-delivered event ids within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SessionEvent]
    val query = graft.streaming.StreamDedup.dedupe(input.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(SessionEvent(1L, ts(100), 10, 1.0), SessionEvent(1L, ts(100), 10, 1.0))
      query.processAllAvailable()
      // Same id re-delivered in a later batch, still inside the horizon.
      input.addData(SessionEvent(1L, ts(101), 10, 1.0), SessionEvent(1L, ts(102), 11, 2.0))
      query.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(10L, 11L),
        s"expected each id once, got ${out.toSeq}")
    } finally query.stop()
  }

  test("RateMonitor counts sliding-window rates per event type") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val rates = RateMonitor.rates(input.toDS().toDF("ts", "event_type"))
    val query = rates.writeStream
      .format("memory")
      .queryName("rates_out")
      .outputMode("update")
      .start()
    try {
      input.addData(
        (ts(0), "click"), (ts(0), "click"), (new Timestamp(30 * 1000), "view")
      )
      query.processAllAvailable()
      val out = spark.table("rates_out")
      // 1-minute windows sliding 30s: the t=[0,1min) window holds 2 clicks.
      val clicks = out
        .filter(col("event_type") === "click" && col("win_start") === new Timestamp(0))
        .agg(max("n_requests")).collect()(0).getLong(0)
      assert(clicks == 2, s"expected 2 clicks in the [0,1min) window")
    } finally query.stop()
  }
}
