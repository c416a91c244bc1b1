package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.{DocEvent, StreamLshDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Long-horizon soaks (r14): the bounded-state claims of the streaming
  * components, exercised for 50 epochs over the full sf0.1 corpus —
  * long enough that MONOTONE growth (the failure mode a 3-batch spec
  * cannot see) separates cleanly from the steady-state plateau the
  * watermark + caps are supposed to produce.
  */
class StreamSoakSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000)

  test("StreamLshDedup 50-epoch soak: state-store rows plateau under the watermark horizon") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // 50 epochs x 100 docs = the whole sf0.1 corpus, event time
    // advancing one minute per epoch against a 10-minute horizon. A
    // bucket's state times out at lastArrival + horizon measured
    // against a watermark that itself trails by the horizon, so state
    // lifetime is ~2x horizon ≈ 21 epochs of docs — without eviction
    // the store would hold all 5000 docs x 8 bands by epoch 50; with
    // it, rows must plateau near the ~2100-doc window.
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val epochs = 50
    val perEpoch = docs.length / epochs
    val input = MemoryStream[DocEvent]
    val query = StreamLshDedup.candidates(input.toDS(), horizon = "10 minutes")
      .writeStream.format("memory").queryName("lsh_soak").outputMode("append").start()
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      for (e <- 0 until epochs) {
        val slice = docs.slice(e * perEpoch, (e + 1) * perEpoch)
          .map { case (id, text) => DocEvent(id, ts(e), text) }
        input.addData(slice: _*)
        query.processAllAvailable()
        stateRows += Option(query.lastProgress)
          .flatMap(p => p.stateOperators.headOption).map(_.numRowsTotal).getOrElse(0L)
      }
    } finally query.stop()
    assert(stateRows.length == epochs && stateRows.last > 0, s"soak did not run: $stateRows")
    val unevicted = docs.length.toLong * graft.dedup.Dedup.NumBands // 40k if nothing ever evicts
    val peak = stateRows.max
    assert(peak < unevicted * 0.6,
      s"state grew like an unevicted store: peak $peak of $unevicted possible")
    // Plateau, not monotone growth: the last-decade maximum must sit
    // within noise of the mid-run maximum (both windows are past the
    // ~21-epoch warm-up where growth is legitimate).
    val mid = stateRows.slice(25, 40).max
    val late = stateRows.slice(40, 50).max
    assert(late <= (mid * 1.3).toLong,
      s"state still growing after warm-up: mid-run max $mid, late max $late ($stateRows)")
  }

  test("IngestPipeline 50-epoch soak: ledger rows track distinct docs, not epochs") {
    import spark.implicits._
    // 50 lake files, one per epoch; every doc appears in exactly TWO
    // files (epoch e and epoch e+25 carry the same slice), so half the
    // arrivals are cross-epoch duplicates. The ledger's bounded-growth
    // contract: rows accrue once per DISTINCT landed doc — a replayed
    // or duplicated arrival appends nothing — so after 50 epochs the
    // ledger holds exactly the distinct exported set, and every
    // second-copy epoch directory is absent (its batch deduped to
    // empty) or holds only genuinely fresh docs.
    val srcDir = Files.createTempDirectory("soak_src").toString
    val outDir = Files.createTempDirectory("soak_out").toString + "/shards"
    val ledgerDir = Files.createTempDirectory("soak_ledger").toString + "/ledger"
    val ckptDir = Files.createTempDirectory("soak_ckpt").toString

    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).take(1000)
    val evalDocs = Seq((9000L, "held out benchmark prompt that must never appear in a shard"))
      .toDF("doc_id", "text")
    val perFile = 40 // 25 distinct slices of 40 docs, each landed twice
    for (e <- 0 until 50) {
      val slice = docs.slice((e % 25) * perFile, (e % 25 + 1) * perFile)
      val tmp = Files.createTempDirectory("soakfile").toString
      slice.toSeq.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"f$e%02d.parquet")
      Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(1000000L + e * 1000L), "mtime not settable")
    }

    val q = graft.streaming.IngestPipeline.start(
      spark, srcDir, evalDocs, outDir, ledgerDir, ckptDir, availableNow = true)
    q.awaitTermination()

    // Ledger TOTAL rows (not distinct — a row per append) must equal
    // the distinct landed docs: 50 epochs of arrivals, zero duplicate
    // appends. This is the monotone-growth check: an epoch that
    // re-appended already-landed hashes would show up as rows > docs.
    val distinctTexts = docs.take(25 * perFile).map(_._2).distinct.length.toLong
    val ledgerRows = spark.read.parquet(ledgerDir).count()
    val ledgerDistinct = spark.read.parquet(ledgerDir).select("h").distinct().count()
    assert(ledgerDistinct == distinctTexts,
      s"ledger membership wrong: $ledgerDistinct hashes for $distinctTexts distinct texts")
    assert(ledgerRows == distinctTexts,
      s"ledger grew beyond distinct docs: $ledgerRows rows for $distinctTexts docs " +
        "(duplicate arrivals must never re-append)")

    // And the exported corpus is exactly one copy per distinct text.
    val exported = spark.read.option("basePath", outDir)
      .parquet((0 until 50).map(e => s"$outDir/epoch=$e").filter(p =>
        Files.exists(java.nio.file.Paths.get(p))): _*)
    val exportedIds = exported.select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedIds = docs.take(25 * perFile).groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(exportedIds == expectedIds,
      s"exported set diverged: ${exportedIds.diff(expectedIds).take(5)} extra, " +
        s"${expectedIds.diff(exportedIds).take(5)} missing")
  }
}
