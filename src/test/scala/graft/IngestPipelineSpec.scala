package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The composed ingest pipeline: files land one per epoch; the gate
  * drops eval-contaminated docs, the ledger dedups across epochs, the
  * export writes epoch shard groups — and the whole streamed result
  * equals the batch-computed gate∘dedup of the full input.
  */
class IngestPipelineSpec extends SparkSpec {

  private def writeLakeFile(df: org.apache.spark.sql.DataFrame, srcDir: String, name: String, mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("lakefile").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(srcDir, name)
    Files.copy(part.toPath, dst.toPath)
    assert(dst.setLastModified(mtime), "mtime not settable")
  }

  test("ingest pipeline: gate, cross-epoch dedup, and export compose to the batch answer") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("ingest_src").toString
    val outDir = Files.createTempDirectory("ingest_out").toString + "/shards"
    val ledgerDir = Files.createTempDirectory("ingest_ledger").toString + "/ledger"
    val ckptDir = Files.createTempDirectory("ingest_ckpt").toString

    val evalDocs = Seq(
      (9000L, "held out benchmark question about the seven bridges of konigsberg graph"),
      (9001L, "another frozen evaluation prompt that must never leak into training shards"))
      .toDF("doc_id", "text")

    // epoch 0: clean docs + one verbatim eval text (contaminated)
    val f0 = Seq(
      (1L, "spark partitions shuffle data across executors during wide transformations"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "held out benchmark question about the seven bridges of konigsberg graph"))
      .toDF("doc_id", "text")
    // epoch 1: a fresh doc + an exact duplicate of doc 1 (cross-epoch dup)
    val f1 = Seq(
      (10L, "columnar storage lets scans skip data via footer statistics"),
      (11L, "spark partitions shuffle data across executors during wide transformations"))
      .toDF("doc_id", "text")
    // epoch 2: duplicate of doc 10, a clean doc, and a doc embedding an
    // eval 8-gram mid-text (contaminated by overlap, not verbatim)
    val f2 = Seq(
      (20L, "columnar storage lets scans skip data via footer statistics"),
      (21L, "broadcast joins avoid shuffling the large fact table entirely"),
      (22L, "prefix words then another frozen evaluation prompt that must never leak into training shards and suffix"))
      .toDF("doc_id", "text")

    writeLakeFile(f0, srcDir, "f0.parquet", 1000000L)
    writeLakeFile(f1, srcDir, "f1.parquet", 2000000L)
    writeLakeFile(f2, srcDir, "f2.parquet", 3000000L)

    val q = graft.streaming.IngestPipeline.start(
      spark, srcDir, evalDocs, outDir, ledgerDir, ckptDir, availableNow = true)
    q.awaitTermination()

    // one epoch dir per file, in landing order
    (0 to 2).foreach { e =>
      assert(Files.exists(Paths.get(s"$outDir/epoch=$e")), s"epoch $e dir missing")
    }
    val exported = spark.read.option("basePath", outDir)
      .parquet((0 to 2).map(e => s"$outDir/epoch=$e"): _*)
    val got = exported.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 10L, 21L),
      s"exported set wrong: $got (gate must drop 3 and 22; dedup must drop 11 and 20)")

    // the streamed result IS the batch answer: gate + global first-copy
    // dedup over the full input with an empty ledger
    val all = f0.unionByName(f1).unionByName(f2)
    val (bloom, evalSh) = graft.dedup.Dedup.evalDecontamIndex(evalDocs)
    val emptyLedger = Seq.empty[Long].toDF("h")
    val batchAnswer = graft.streaming.IngestPipeline
      .gateAndDedup(all, bloom, evalSh, emptyLedger)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchAnswer == got, s"stream/batch divergence: batch=$batchAnswer stream=$got")

    // the ledger holds exactly the exported texts' hashes
    val ledgerHashes = spark.read.parquet(ledgerDir).select("h").distinct()
      .collect().map(_.getLong(0)).toSet
    val expectedHashes = all.filter(col("doc_id").isin(got.toSeq: _*))
      .select(xxhash64(col("text"))).collect().map(_.getLong(0)).toSet
    assert(ledgerHashes == expectedHashes, "ledger out of sync with exports")

    // shard payloads decode losslessly through the shared tokenizer
    val tok = exported.filter(col("doc_id") === 21L)
      .select("token_ids").as[Seq[Int]].head()
    assert(graft.functions.Bpe.decode(tok.toArray) ==
      "broadcast joins avoid shuffling the large fact table entirely")

    // the manifest is derivable per epoch group
    val mf = graft.sources.ShardExport.manifest(spark, s"$outDir/epoch=0")
    assert(mf.count() >= 1 && mf.agg(sum("n_rows")).head.getLong(0) == 2L)

    // REPLAY INSENSITIVITY: a replayed epoch must reproduce its full
    // export even though the ledger already holds the epoch's own
    // hashes (the crash-between-append-and-replay scenario). The
    // epoch-tagged ledger makes this hold: filtering to strictly
    // earlier epochs removes the self-pollution; without the filter the
    // epoch's own rows would anti-join doc 21 away and the replay would
    // overwrite epoch=2 with a strict subset.
    val fullLedger = spark.read.parquet(ledgerDir)
    val replayed = graft.streaming.IngestPipeline
      .gateAndDedup(f2, bloom, evalSh, fullLedger.filter(col("epoch") < 2))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replayed == Set(21L), s"replay of epoch 2 diverged: $replayed")
    val selfPolluted = graft.streaming.IngestPipeline
      .gateAndDedup(f2, bloom, evalSh, fullLedger)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(selfPolluted == Set.empty[Long],
      "sanity: an untagged replay WOULD lose the epoch's docs — the epoch filter is load-bearing")
  }
}
