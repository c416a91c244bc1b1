package graft.streaming

import graft.dedup.Dedup
import graft.sources.ShardExport
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The composed ingest path — files land, training shards come out:
  *
  *   readStream(lake dir) → decontamination gate → exact dedup against
  *   a standing ledger → tokenized, packed, shuffled shard export
  *
  * Every stage is a component this library already ships and specs
  * individually (`Dedup.ingestDecontamGate`, `Dedup.evalDecontamIndex`,
  * `ShardExport.exportEpoch`); this object is the glue that proves they
  * COMPOSE under streaming semantics — the shape a 100 TB deployment
  * actually runs, where "the corpus" is a directory new crawl files
  * keep landing in, not a frozen table.
  *
  * Semantics per micro-batch (epoch):
  * 1. GATE: drop documents sharing an 8-gram with the eval index
  *    (built ONCE at boot — a stream must never rebuild an index per
  *    batch; broadcast-sized by the static-eval-set contract).
  * 2. DEDUP: exact text-hash dedup — keep the min-doc_id copy within
  *    the batch, drop anything whose hash is already in the LEDGER
  *    (a tiny lake-resident (hash) table appended per epoch: the
  *    standing memory that makes cross-batch dedup exact; fuzzy
  *    near-dup at ingest is StreamLshDedup's separate pre-filter, and
  *    the nightly batch pass stays the near-dup authority).
  * 3. EXPORT: `exportEpoch` — tokenize, pack, salt-shuffle by epoch,
  *    write `epoch=N` shard dirs. Idempotent on retry: a replayed
  *    epoch overwrites its own directory byte-identically.
  *
  * The ledger append is idempotent in EFFECT, not in storage: a retried
  * epoch re-appends the same hashes, and the anti-join semantics of a
  * ledger make duplicate rows harmless (membership is membership).
  * Ledger rows are TAGGED with the epoch that wrote them, and each
  * epoch anti-joins only rows from STRICTLY EARLIER epochs — so a
  * replayed epoch is insensitive to its own (possibly torn/partial)
  * prior append: without the tag, a crash between ledger append and
  * export replay would leave the epoch anti-joining against its own
  * partial hashes, exporting a strict subset over the previously
  * complete epoch directory (docs in the ledger but in no shard). The
  * spec pins the material guarantees: exported docs are exactly the
  * batch-computed gate∘dedup of the full input, contaminated docs never
  * land, cross-batch duplicates land once, and a replay over a
  * self-polluted ledger reproduces the full epoch.
  *
  * Scale shape: the gate is scan-local probing against a broadcast
  * sketch; the dedup shuffle is per-batch-sized (hash keys only) plus a
  * broadcast anti-join against the ledger scan; the export repartitions
  * one batch. Nothing in the loop touches corpus-scale state — the
  * ledger grows with distinct documents but joins by hash only, and at
  * 100 TB it is the bloom-fronted standing index the batch operators
  * already model.
  */
object IngestPipeline {

  val InputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** One micro-batch transform: gate → in-batch dedup → ledger dedup.
    * Factored out so the spec can hold the streaming result to the
    * batch-computed answer.
    */
  private[graft] def gateAndDedup(
      batch: DataFrame,
      bloom: Array[Byte],
      evalSh: DataFrame,
      ledger: DataFrame): DataFrame = {
    val gated = Dedup.ingestDecontamGate(batch.select("doc_id", "text"), bloom, evalSh)
    val hashed = gated.withColumn("h", xxhash64(col("text")))
    val inBatchFirst = hashed
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rk") === 1)
      .drop("rk")
    inBatchFirst
      .join(ledger.select(col("h")).distinct(), Seq("h"), "left_anti")
      .drop("h")
  }

  /** Start the pipeline over a parquet lake directory. Processes
    * whatever is present (and whatever lands) one file per micro-batch;
    * with `availableNow` it drains the directory and stops.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      evalDocs: DataFrame,
      outDir: String,
      ledgerDir: String,
      checkpointDir: String,
      availableNow: Boolean = false): StreamingQuery = {
    val (bloom, evalSh) = Dedup.evalDecontamIndex(evalDocs)
    // Eval shingles are broadcast into every epoch's confirm join; keep
    // the frame materialized once, not recomputed per batch.
    val evalShLocal = evalSh.persist()
    evalShLocal.count()
    val stream = spark.readStream
      .schema(InputSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val writer = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        val s = b.sparkSession
        val lp = new org.apache.hadoop.fs.Path(ledgerDir)
        val lfs = lp.getFileSystem(s.sparkContext.hadoopConfiguration)
        val ledger =
          if (lfs.exists(lp))
            // Only rows appended by STRICTLY EARLIER epochs count as
            // "already landed": a replayed epoch must not anti-join
            // against its own partial append (see scaladoc).
            s.read.parquet(ledgerDir).filter(col("epoch") < lit(epoch))
          else s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("h", LongType))))
        val fresh = gateAndDedup(b, bloom, evalShLocal, ledger)
          .persist()
        try {
          if (fresh.head(1).nonEmpty) {
            ShardExport.exportEpoch(fresh, epoch, outDir)
            fresh.select(xxhash64(col("text")).as("h"))
              .withColumn("epoch", lit(epoch))
              .write.mode("append").parquet(ledgerDir)
          }
        } finally { fresh.unpersist(blocking = false); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
