package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketed tables: both sides pre-hashed into the
  * same bucket layout on the join key, so the join needs NO shuffle at
  * read time — the bucket id IS the partition assignment. This is the
  * standing answer to "the same big join runs every hour": pay the
  * shuffle once at write, never again. The spec proves the property at
  * the plan level (no Exchange above either scan).
  *
  * Reference analog: HistoricalMatch keyed by (match_id, region) joined
  * against per-match timelines for every analysis pass
  * (models.py:61-66); a production deployment buckets both by match_id.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed+sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
