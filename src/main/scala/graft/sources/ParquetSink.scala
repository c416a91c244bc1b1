package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest/repair surface: partitioned parquet writes and idempotent
  * append — the collection layer of the reference re-expressed as lake
  * operations.
  *
  * Reference mapping:
  * - proto_data_gathering.py / active_data_gathering.py insert matches
  *   keyed by (match_id, region) with DB unique constraints absorbing
  *   re-fetches → here: anti-join upsert (append only unseen keys).
  * - periodical_data_repair.py:31-60 get_incomplete_records scans for
  *   NULL result/timeline columns → here: incompleteRecords scan whose
  *   filter pushes down to the parquet reader.
  *
  * Scale notes: partition columns must be low-cardinality (date, region
  * — never user ids) or the lake degrades into millions of tiny files;
  * the anti-join is a shuffle join on the key, which AQE converts to a
  * broadcast when the incoming batch is small — the common repair case.
  */
object ParquetSink {

  /** Partitioned write. `overwritePartitions=true` replaces only the
    * partitions present in `df` (dynamic overwrite), the idempotent
    * re-run mode for batch ingest.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      overwritePartitions: Boolean = false
  ): Unit = {
    val writer = df.write
      .partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", if (overwritePartitions) "dynamic" else "static")
      .mode(if (overwritePartitions) SaveMode.Overwrite else SaveMode.Append)
    writer.parquet(path)
  }

  /** Idempotent append: write only incoming rows whose key is not yet in
    * the sink. Returns the number of rows appended. Re-running the same
    * batch is a no-op — the reference got this from DB unique
    * constraints; a lake needs the anti-join.
    */
  def upsertByAntiJoin(
      spark: SparkSession,
      incoming: DataFrame,
      path: String,
      keys: Seq[String]
  ): Long = {
    val fresh =
      if (!exists(spark, path)) incoming
      else {
        val existingKeys = spark.read.parquet(path).select(keys.map(col): _*).distinct()
        incoming.join(existingKeys, keys, "left_anti")
      }
    // Materialize BEFORE appending: the lazy plan would otherwise
    // re-read the sink it is writing to. localCheckpoint (eager) cuts
    // the lineage entirely — unlike cache(), a lost cached partition
    // cannot trigger recompute that re-lists the sink mid-append.
    val appended = fresh.localCheckpoint(true)
    val n = appended.count()
    if (n > 0) appended.write.mode(SaveMode.Append).parquet(path)
    n
  }

  /** Repair scan: rows whose required columns are incomplete (NULL).
    * The IsNull disjunction pushes down to the parquet reader.
    */
  def incompleteRecords(df: DataFrame, requiredCols: Seq[String]): DataFrame =
    df.filter(requiredCols.map(c => col(c).isNull).reduce(_ || _))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
