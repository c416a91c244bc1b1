package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the test schema. Callers `select()` the
  * columns they need at the use-site so Catalyst prunes the scan
  * (`ReadSchema` in explain shows only referenced columns).
  *
  * Reference data model (see /root/reference/dj_lol_dcs/lolapi/models.py):
  * HistoricalMatch (fact) ~ lineitem/orders; Region/GameVersion (dims) ~
  * region/nation/part/supplier; timeline event stream ~ events.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  /** events.ts has shipped in two physical schemas across testdata
    * generations: parquet TIMESTAMP(NANOS) (no native Spark type; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a
    * nanos-since-epoch long) and plain TIMESTAMP(MICROS)
    * (isAdjustedToUTC=false, which Spark loads as TIMESTAMP_NTZ). Branch
    * on the loaded dtype so either generation normalizes to the same
    * session-TZ microsecond timestamp the rest of the engine (and the
    * DuckDB oracle, via epoch_us) expects. The session TZ is pinned to
    * UTC in [[GraftSession]], so the NTZ→TZ cast is value-preserving.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(t(spark, dir, "events"))

  /** The generation-adaptive `ts` normalization, factored out so the
    * contract spec can exercise BOTH branches on synthetic frames (the
    * legacy int64-nanos branch is dead against current testdata but
    * must keep working — the driver has shipped both schemas).
    */
  private[graft] def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
