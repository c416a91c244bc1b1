package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing layout: assign every document its (pack, offset)
  * position in the concatenated token stream chunked at `PackBudget`
  * tokens — the concat-and-chunk layout pre-training dataloaders
  * consume (docs may straddle pack boundaries, exactly like the
  * tokenized stream they feed).
  *
  * The interesting part at 100 TB is the GLOBAL exclusive prefix sum of
  * token counts in doc_id order: a single `Window.orderBy` with no
  * partition key would pull the whole corpus through one task. This is
  * the classic two-level distributed prefix sum instead:
  *   1. order-preserving blocks (doc_id / BlockSize) — each block's
  *      internal running sum is a window partitioned by block id, a
  *      high-cardinality key with bounded (~BlockSize-row) partitions;
  *   2. block TOTALS form a metadata-scale frame (n / BlockSize rows);
  *      the running sum over that tiny frame is the only global window
  *      and never touches corpus-scale data (recurse the same trick if
  *      even that frame grows too large);
  *   3. a keyed join adds each block's prefix back to its rows —
  *      AQE broadcasts the block-prefix side.
  */
object SeqPack {

  /** Tokens per pack (a typical pre-training context length). */
  val PackBudget = 2048L

  /** Docs per prefix block: bounds the per-partition window at step 1
    * and shrinks the global frame at step 2 by this factor.
    */
  val BlockSize = 256L

  /** Per-group packing: the same two-level prefix sum, computed
    * independently WITHIN each value of `groupCol` (offsets and pack
    * ids restart per group). This is what a split-partitioned training
    * export needs — packing the whole corpus and then partitioning by
    * split would tear packs across split directories. The group key
    * joins every window/aggregate key, so the global-window stage stays
    * metadata-scale per group.
    */
  def seqPackWithin(docs: DataFrame, groupCol: String): DataFrame = {
    val blocked = docs.withColumn("blk", floor(col("doc_id") / BlockSize).cast("long"))
    val wIn = Window.partitionBy(groupCol, "blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = blocked.withColumn("local_off", coalesce(sum("n_tokens").over(wIn), lit(0L)))
    val wBlk = Window.partitionBy(groupCol).orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockPrefix = blocked
      .groupBy(col(groupCol), col("blk"))
      .agg(sum("n_tokens").as("blk_total"))
      .withColumn("blk_off", coalesce(sum("blk_total").over(wBlk), lit(0L)))
      .select(col(groupCol), col("blk"), col("blk_off"))
    // passthrough columns (e.g. the token-id payload a shard export
    // carries) ride along untouched — the packing layout only needs
    // (doc_id, groupCol, n_tokens)
    val extras = docs.columns.filterNot(Set("doc_id", groupCol, "n_tokens")).map(col)
    local
      .join(blockPrefix, Seq(groupCol, "blk"))
      .withColumn("start_offset", col("blk_off") + col("local_off"))
      .select(
        Seq(
          col("doc_id"),
          col(groupCol),
          col("n_tokens"),
          col("start_offset"),
          floor(col("start_offset") / PackBudget).cast("long").as("pack_id"),
          pmod(col("start_offset"), lit(PackBudget)).cast("long").as("pack_offset")
        ) ++ extras: _*)
  }

  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    val blocked = docs.withColumn("blk", floor(col("doc_id") / BlockSize).cast("long"))
    val wIn = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = blocked.withColumn("local_off", coalesce(sum("n_tokens").over(wIn), lit(0L)))
    val wBlk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    val blockPrefix = blocked
      .groupBy("blk")
      .agg(sum("n_tokens").as("blk_total"))
      .withColumn("blk_off", coalesce(sum("blk_total").over(wBlk), lit(0L)))
      .select("blk", "blk_off")
    local
      .join(blockPrefix, "blk")
      .withColumn("start_offset", col("blk_off") + col("local_off"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("start_offset"),
        floor(col("start_offset") / PackBudget).cast("long").as("pack_id"),
        pmod(col("start_offset"), lit(PackBudget)).cast("long").as("pack_offset"))
      .orderBy("doc_id")
  }
}
