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
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
    * for; with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as
    * nanos-since-epoch long and is normalized here to a microsecond
    * timestamp (same truncation DuckDB applies via epoch_us).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
