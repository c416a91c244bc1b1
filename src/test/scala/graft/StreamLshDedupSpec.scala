package graft

import graft.dedup.Dedup
import graft.streaming.{DocEvent, StreamLshDedup}
import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamLshDedupSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000)

  private def docEvents(offsetMin: Long = 100): Seq[DocEvent] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.map { case (id, text) => DocEvent(id, ts(offsetMin + id % 7), text) }
  }

  test("per-row band keys equal the batch explode+groupBy construction") {
    import spark.implicits._
    val stream = StreamLshDedup
      .withBands(docEvents().toDS())
      .select("band", "key", "doc_id")
    // the batch operator's construction, rebuilt verbatim
    val sh = Dedup.shingles(Tables.documents(spark, sfDir))
      .select(col("doc_id"), xxhash64(col("sg")).as("sg"))
    val minAggs = (0 until Dedup.MinHashK).map(i => min(xxhash64(col("sg"), lit(i))).as(s"m$i"))
    val sig = sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until Dedup.NumBands).map { j =>
      val rowCols = (j * Dedup.BandRows until (j + 1) * Dedup.BandRows).map(i => col(s"m$i"))
      struct(lit(j).as("band"), xxhash64(rowCols :+ (lit(j): Column): _*).as("key"))
    }
    val batch = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("doc_id"))
    assert(stream.exceptAll(batch).count() == 0 && batch.exceptAll(stream).count() == 0,
      "stream per-row signatures diverge from the batch groupBy signatures")
  }

  test("streamed candidates across micro-batches match batch LSH collisions; verified pairs all surface") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val events = docEvents()
    val (first, second) = events.partition(_.doc_id % 2 == 0)
    val input = MemoryStream[DocEvent]
    val query = StreamLshDedup.candidates(input.toDS(), horizon = "10 days")
      .writeStream.format("memory").queryName("lsh_out").outputMode("append").start()
    try {
      input.addData(first: _*)
      query.processAllAvailable()
      input.addData(second: _*)
      query.processAllAvailable()
      val got = spark.table("lsh_out").select("a", "b").distinct()
      // batch collision pairs from the SAME band construction
      val bands = StreamLshDedup.withBands(events.toDS()).select("band", "key", "doc_id")
      val expected = bands.toDF("band", "key", "a")
        .join(bands.toDF("band2", "key2", "b"),
          col("band") === col("band2") && col("key") === col("key2") && col("a") < col("b"))
        .select("a", "b").distinct()
      assert(got.exceptAll(expected).count() == 0, "stream invented a candidate")
      assert(expected.exceptAll(got).count() == 0, "stream lost a collision pair across batches")
      // every exact-verified batch near-dup pair surfaces at ingest with
      // a strong estimate (the pre-filter/authority contract)
      val verified = Dedup.minhashLsh(spark, sfDir).select("a", "b")
      assert(verified.exceptAll(got).count() == 0, "a verified near-dup pair never surfaced")
      val est = spark.table("lsh_out").groupBy("a", "b").agg(max("est_sim").as("est"))
      assert(verified.join(est, Seq("a", "b")).filter(col("est") < 0.5).count() == 0,
        "a true near-dup surfaced only with a weak estimate")
    } finally query.stop()
  }

  test("ingest decontamination gate drops exactly the eval-contaminated docs") {
    import spark.implicits._
    val evalText = "a b c d e f g h i j"
    val evalDocs = Seq((0L, evalText)).toDF("doc_id", "text")
    val (bloom, evalSh) = Dedup.evalDecontamIndex(evalDocs)
    // 21 copies an 8-gram (contaminated), 22 shares only a 7-gram, 23
    // is clean, 24 is too short to carry an 8-gram.
    val batch = Seq(
      (21L, "x y a b c d e f g h"),
      (22L, "a b c d e f g X i j"),
      (23L, "entirely different words with no overlap at all here ok"),
      (24L, "a b c")
    ).toDF("doc_id", "text")
    val kept = Dedup.ingestDecontamGate(batch, bloom, evalSh)
    assert(kept.columns.toSeq == Seq("doc_id", "text"), "gate must not leak working columns")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(22L, 23L, 24L),
      "gate verdicts must equal the batch decontaminate verdicts")
    // ...and in a stream: the gate runs per micro-batch via foreachBatch
    // BEFORE dedup state — contaminated docs never reach the sink.
    implicit val sql = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val passed = scala.collection.mutable.Set[Long]()
    val query = input.toDS().writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[DocEvent], _: Long) =>
        passed ++= Dedup.ingestDecontamGate(b.toDF(), bloom, evalSh)
          .select("doc_id").collect().map(_.getLong(0))
        (): Unit
      }
      .start()
    try {
      input.addData(batch.collect().toSeq.map(r =>
        DocEvent(r.getLong(0), ts(100 + r.getLong(0)), r.getString(1))): _*)
      query.processAllAvailable()
      assert(passed.toSet == Set(22L, 23L, 24L), s"stream gate diverged: $passed")
    } finally query.stop()
  }

  test("re-delivered documents emit nothing new; viral buckets stay capped") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DocEvent]
    val query = StreamLshDedup.candidates(input.toDS(), horizon = "10 days")
      .writeStream.format("memory").queryName("lsh_redeliver").outputMode("append").start()
    try {
      val spam = "key agg row scan slow fast table value part hash"
      val flood = (1L to 70L).map(i => DocEvent(i, ts(100 + i), spam))
      input.addData(flood: _*)
      query.processAllAvailable()
      val afterFlood = spark.table("lsh_redeliver").count()
      // identical docs share every bucket: arrival i meets min(i-1, cap)
      // retained entries per band
      val cap = StreamLshDedup.MaxPerBucket
      val expected = Dedup.NumBands.toLong *
        (1L until 70L).map(i => math.min(i, cap.toLong)).sum
      assert(afterFlood == expected, s"flood emitted $afterFlood, expected $expected")
      assert(spark.table("lsh_redeliver").filter(col("a") === col("b")).count() == 0)
      assert(spark.table("lsh_redeliver").filter(col("est_sim") =!= 1.0).count() == 0,
        "identical docs must estimate sim 1.0")
      // doc 70 arrived after the cap: it saw exactly cap partners per band
      assert(spark.table("lsh_redeliver")
        .filter(col("b") === 70L).select("a").distinct().count() == cap)
      // re-deliver an id still in state (the cap keeps the newest 64,
      // ids 7-70): silence.
      input.addData(DocEvent(50L, ts(400), spam))
      query.processAllAvailable()
      assert(spark.table("lsh_redeliver").count() == afterFlood, "re-delivery emitted pairs")
      // re-deliver an id the cap ALREADY EVICTED from the signature
      // entries (ids 1-6): the ids-only seen set still suppresses it —
      // idempotence survives cap eviction within the horizon/SeenCap.
      input.addData(DocEvent(3L, ts(401), spam))
      query.processAllAvailable()
      assert(spark.table("lsh_redeliver").count() == afterFlood,
        "re-delivery of a cap-evicted id emitted pairs")
    } finally query.stop()
  }

  test("quality-gated ingest: junk never enters bucket state, clean near-dups still surface") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // two near-identical CLEAN docs (pass every Gopher rule: 60 distinct
    // words, stopwords present, mean word length in band) and two
    // IDENTICAL junk docs (10 words, one repeated — fails wc and rep)
    // that would otherwise be the strongest possible LSH pair
    val cleanWords = (1 to 56).map(i => f"word$i%02d") ++ Seq("the", "a", "of", "and")
    val clean1 = cleanWords.mkString(" ")
    val clean2 = (cleanWords.dropRight(1) :+ "tail").mkString(" ")
    val junk = Seq.fill(10)("spam").mkString(" ")
    val events = Seq(
      DocEvent(1L, ts(100), clean1), DocEvent(2L, ts(101), clean2),
      DocEvent(8L, ts(102), junk), DocEvent(9L, ts(103), junk))
    def run(gate: Boolean, name: String): (Long, Set[(Long, Long)]) = {
      val input = MemoryStream[DocEvent]
      val query = StreamLshDedup.candidates(input.toDS(), horizon = "10 days", qualityGate = gate)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        input.addData(events: _*)
        query.processAllAvailable()
        val state = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
        (state, spark.table(name).select("a", "b").distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      } finally query.stop()
    }
    val (gatedState, gatedPairs) = run(gate = true, "lsh_gated")
    val (openState, openPairs) = run(gate = false, "lsh_open")
    // ungated: the identical junk pair floods through
    assert(openPairs.contains((8L, 9L)), "ungated run should emit the junk pair")
    // gated: junk emits nothing and holds NO state — the state row count
    // equals exactly the clean docs' distinct (band, key) buckets
    assert(!gatedPairs.exists(p => p._1 >= 8L || p._2 >= 8L), "junk leaked through the gate")
    val cleanBuckets = StreamLshDedup
      .withBands(events.filter(_.doc_id <= 2L).toDS())
      .select("band", "key").distinct().count()
    assert(gatedState == cleanBuckets,
      s"gated state holds $gatedState rows, expected $cleanBuckets (clean buckets only)")
    assert(gatedState < openState, "gating must shrink the state store")
    // the clean near-dup pair still surfaces at ingest
    assert(gatedPairs.contains((1L, 2L)), "gate dropped a clean near-dup pair")
  }
}
