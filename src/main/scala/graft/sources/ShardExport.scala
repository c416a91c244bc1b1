package graft.sources

import graft.Tables
import graft.operators.{SeqPack, Splits}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export: the terminal sink of the curation pipeline —
  * packed sequences land as split-partitioned, size-bounded,
  * internally-sorted parquet shards a training job can map to data
  * loaders 1:1.
  *
  * The writer features doing the work are all native parquet-sink
  * controls, not custom code: `partitionBy(split)` gives the
  * train/valid/test directory layout (readers prune by directory);
  * `maxRecordsPerFile` bounds every shard file so loader memory and
  * work-stealing granularity are fixed regardless of corpus size;
  * `repartition(split, shard)` spreads each split over writer tasks
  * (shard = pack_id mod shardsPerSplit, so a pack never straddles
  * writers); `sortWithinPartitions(pack_id, pack_offset)` makes file
  * contents deterministic and sequential-read-friendly. At 100 TB the
  * same call shape holds — shardsPerSplit scales writer parallelism,
  * maxRecordsPerFile caps file size, and no driver-side work occurs.
  */
object ShardExport {

  /** Default rows per shard file (tiny for testability; production
    * sizes this to the loader's memory budget).
    */
  val DefaultMaxRecords = 1000

  /** The frame a training export ships: leakage-safe split labels
    * (cluster-id hash, so near-duplicates never straddle train/test)
    * assigned FIRST, then sequences packed independently WITHIN each
    * split — packing before splitting would tear packs across split
    * directories and leave every split's packs full of holes.
    *
    * Lengths are REAL tokenizer output, not whitespace estimates: the
    * graft_bpe id array is both the `n_tokens` the packer budgets on
    * and the payload the shards carry — what a dataloader actually
    * consumes (BpeSpec pins decode(token_ids) == text, so the shards
    * are a lossless representation of the corpus).
    *
    * The split labels ride leakageSafeSplit, which consumes the
    * PUBLISHED cluster table when an artifacts root is configured
    * (graft.sources.Artifacts) — an export run in a deployment that has
    * materialized clusters pays a parquet read, not a second full
    * near-dup pipeline.
    */
  def packedWithSplits(spark: SparkSession, dir: String,
      epochSalt: Long = SeqPack.ShuffleSalt): DataFrame = {
    // The tokenized corpus is itself a published artifact when a root
    // is configured: tokenization is the most-executed computation in
    // the pipeline, and every export/repack run re-paying it is the
    // same fan-out waste the cluster-table publication kills. The
    // version tag carries the merge table's identity, so swapping the
    // published vocab invalidates the artifact structurally.
    val tokenized = Artifacts.publishedOrCompute(
      spark,
      "tokenized_corpus",
      s"graft_bpe-merges-${graft.functions.Bpe.MergesDigest}",
      Seq(s"$dir/documents.parquet"))(
      Tables
        .documents(spark, dir)
        .select(col("doc_id"), expr("graft_bpe(text)").as("token_ids")))
    // Pack in hash-SHUFFLED order, not doc_id order: doc_id-order
    // packing puts crawl-order / near-dup / same-source neighbors into
    // the same context windows (the correlation docShuffle exists to
    // break). The shuffle key is computed scan-local and rides as the
    // pack order; a new epoch re-packs with a different salt.
    val docs = tokenized
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
      .join(Splits.leakageSafeSplit(spark, dir).select("doc_id", "split"), "doc_id")
      .withColumn("shuffle_key", SeqPack.shuffleKey(col("doc_id"), epochSalt))
    SeqPack.seqPackWithin(docs, "split",
      orderCols = Seq("shuffle_key", "doc_id"),
      blkOf = Some(SeqPack.shuffleBlk(col("shuffle_key"))))
  }

  def export(
      packed: DataFrame,
      path: String,
      shardsPerSplit: Int = 8,
      maxRecordsPerFile: Int = DefaultMaxRecords): Unit =
    packed
      .repartition(col("split"), pmod(col("pack_id"), lit(shardsPerSplit)))
      // `split` leads the sort so the partitioned write's required
      // ordering (by partition columns) is already satisfied — without
      // it FileFormatWriter inserts its own, non-stable sort and the
      // (pack_id, pack_offset) order inside each file is destroyed
      .sortWithinPartitions("split", "pack_id", "pack_offset")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("split")
      .mode("overwrite")
      .parquet(path)

  /** One micro-batch of the STREAMING export: tokenize, pack within
    * the batch, write shards under an epoch-scoped directory. Pack ids
    * restart per epoch by construction — each epoch dir is a
    * self-contained shard group a continuously-training consumer can
    * pick up the moment it commits; global repacking across epochs is
    * the nightly batch job's business (`packedWithSplits`). The EPOCH
    * ID is the shuffle salt, so each epoch's packs hold a differently
    * decorrelated order — and a retried epoch (same id) reproduces the
    * identical layout, preserving idempotence.
    */
  def exportEpoch(
      batch: DataFrame,
      epochId: Long,
      path: String,
      shardsPerSplit: Int = 8,
      maxRecordsPerFile: Int = DefaultMaxRecords): Unit = {
    val packed = SeqPack.seqPackWithin(
      batch
        .select(col("doc_id"), expr("graft_bpe(text)").as("token_ids"))
        .withColumn("n_tokens", size(col("token_ids")).cast("long"))
        .withColumn("split", lit("train"))
        .withColumn("shuffle_key", SeqPack.shuffleKey(col("doc_id"), SeqPack.ShuffleSalt + epochId)),
      "split",
      orderCols = Seq("shuffle_key", "doc_id"),
      blkOf = Some(SeqPack.shuffleBlk(col("shuffle_key"))))
    export(packed, s"$path/epoch=$epochId", shardsPerSplit, maxRecordsPerFile)
  }

  /** Streaming shard export: the ingest-time twin of `export`, via
    * foreachBatch. EXACTLY-ONCE without a transaction log: Structured
    * Streaming re-runs a failed epoch under the SAME epochId, and
    * `exportEpoch` writes each epoch to its own directory with
    * overwrite — a retry is a byte-identical replacement, never a
    * duplicate append (the standard idempotent-file-sink recipe; the
    * checkpoint dir carries the offsets that make epoch replay
    * deterministic).
    */
  def streamExport(
      docs: DataFrame,
      path: String,
      checkpointDir: String,
      shardsPerSplit: Int = 8,
      maxRecordsPerFile: Int = DefaultMaxRecords): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, e: Long) =>
        exportEpoch(b, e, path, shardsPerSplit, maxRecordsPerFile)
      }
      .start()

  /** Shard manifest: one row per written shard file — path, split, row
    * count, packs touched, token total — the tiny table a data loader
    * bootstraps from (assign shards to workers, budget epochs by token
    * totals) without listing or opening the data files themselves.
    *
    * Derived from the WRITTEN files (`_metadata.file_path` on a
    * read-back), not from the pre-write frame, so it can't drift from
    * what actually landed; the aggregate is over file-local groups, so
    * its cost is one read of the shard data and its output is
    * O(files). `n_packs` counts packs intersecting the file —
    * maxRecordsPerFile may cut a task's rows mid-pack, so a pack can
    * span adjacent files of the same shard task and per-file counts
    * can exceed the distinct-pack total when summed (the loader-visible
    * truth: both files must be read to reassemble that pack).
    */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(
        col("_metadata.file_path").as("shard_path"),
        col("split"), col("pack_id"), col("n_tokens"))
      .groupBy("shard_path", "split")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy("shard_path")
}
