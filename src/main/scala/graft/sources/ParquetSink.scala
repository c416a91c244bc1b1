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

  /** Cap on the affected-partition list patchIncomplete collects to the
    * driver: makes the low-cardinality contract self-enforcing (fail
    * fast with a clear message) instead of doc-enforced.
    */
  val MaxPatchPartitions = 10000

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
      if (!pathExists(spark, path)) incoming
      else {
        val existingKeys = spark.read.parquet(path).select(keys.map(col): _*).distinct()
        incoming.join(existingKeys, keys, "left_anti")
      }
    // Materialize BEFORE appending: the lazy plan would otherwise
    // re-read the sink it is writing to. localCheckpoint (eager) cuts
    // the lineage entirely — unlike cache(), a lost cached partition
    // cannot trigger recompute that re-lists the sink mid-append.
    val appended = fresh.localCheckpoint(true)
    // finally (r13): a failed append must still release the checkpoint
    // blocks, or a retrying session leaks storage per attempt.
    try {
      val n = appended.count()
      if (n > 0) appended.write.mode(SaveMode.Append).parquet(path)
      n
    } finally graft.Staging.releaseCheckpoint(appended)
  }

  /** Repair scan: rows whose required columns are incomplete (NULL).
    * The IsNull disjunction pushes down to the parquet reader.
    */
  def incompleteRecords(df: DataFrame, requiredCols: Seq[String]): DataFrame =
    df.filter(requiredCols.map(c => col(c).isNull).reduce(_ || _))

  /** Repair patch-back: fill NULL `patchCols` of existing sink rows from
    * a repair batch keyed by `keys` — the lake analog of the reference's
    * in-place UPDATE (periodical_data_repair.py:60-180 re-fetches and
    * patches rows whose result/timeline came back empty).
    *
    * A lake can't update in place, so this is a read-modify-write
    * bounded to the PARTITIONS that actually contain repairable rows:
    * untouched partitions are never read beyond the (pushed-down)
    * incompleteness probe and never rewritten — at 100 TB the rewrite
    * cost scales with the repaired slice, not the table. Non-null sink
    * values always win over the repair batch (coalesce), so re-running
    * the same batch is a no-op and a stale repair can't clobber data.
    *
    * The affected-partition list is collected to the driver; partition
    * columns are low-cardinality by design (date/region — see the
    * object doc), so this is a bounded small list, not data.
    *
    * @return number of previously-NULL cells' rows actually patched
    */
  def patchIncomplete(
      spark: SparkSession,
      path: String,
      repair: DataFrame,
      keys: Seq[String],
      patchCols: Seq[String],
      partitionCol: String,
      maxPartitions: Int = MaxPatchPartitions
  ): Long = {
    val existing = spark.read.parquet(path)
    val needy = incompleteRecords(existing, patchCols)
      .join(repair.select(keys.map(col): _*).distinct(), keys, "left_semi")
    val parts = needy.select(partitionCol).distinct().limit(maxPartitions + 1).collect().map(_.get(0))
    require(
      parts.length <= maxPartitions,
      s"patchIncomplete: repair touches more than $maxPartitions distinct '$partitionCol' partitions — " +
        "the affected-partition list is collected to the driver, which is only safe for low-cardinality " +
        "partition columns (date/region). Partition by a coarser column or patch in bounded slices.")
    if (parts.isEmpty) return 0L
    val slice = partitionSlice(existing, partitionCol, parts.toSeq)
    // ONE patch row per key: a repair batch with duplicate keys (two
    // re-fetch attempts) must not fan out sink rows through the join —
    // that would permanently duplicate data in the sink. Per column,
    // the max non-null value wins (deterministic merge of attempts).
    val patchSide = repair
      .groupBy(keys.map(col): _*)
      .agg(
        max(col(patchCols.head)).as(s"__patch_${patchCols.head}"),
        patchCols.tail.map(c => max(col(c)).as(s"__patch_$c")): _*)
    // Materialize the patched slice BEFORE overwriting the partitions it
    // was read from (same barrier rationale as upsertByAntiJoin).
    val joined = slice.join(patchSide, keys, "left").localCheckpoint(true)
    // finally (r13): same retry-leak rationale as upsertByAntiJoin.
    try {
      val nPatched = joined
        .filter(patchCols.map(c => col(c).isNull && col(s"__patch_$c").isNotNull).reduce(_ || _))
        .count()
      val patched = joined.select(existing.columns.toSeq.map {
        case c if patchCols.contains(c) => coalesce(col(c), col(s"__patch_$c")).as(c)
        case c => col(c)
      }: _*)
      writePartitioned(patched, path, Seq(partitionCol), overwritePartitions = true)
      nPatched
    } finally graft.Staging.releaseCheckpoint(joined)
  }

  /** The bounded read patchIncomplete rewrites from: a plain isin filter
    * on the partition column, which Spark's partition pruning turns into
    * a directory-level prune — only affected partition dirs are listed
    * and scanned. Kept as a named helper so the pruning contract has a
    * spec (isin over a literal list prunes; wrapping the column in any
    * expression would silently widen the read to the full table).
    */
  private[graft] def partitionSlice(existing: DataFrame, partitionCol: String, parts: Seq[Any]): DataFrame =
    existing.filter(col(partitionCol).isin(parts: _*))

  /** Small-file compaction: rewrite a parquet dir into
    * ceil(bytes / targetBytes) files. Ingest upserts append a file per
    * batch; left alone, a year of hourly batches is ~10^4 files per
    * partition and scan planning starts to dominate queries — the
    * standard lake-maintenance rewrite. Uses coalesce (narrow, no
    * shuffle) since compaction only ever reduces file count, and the
    * staged-swap commit (never delete-before-write) so the source data
    * stays durable until the replacement is fully written. Run per
    * partition directory for partitioned sinks (keeps the rewrite
    * bounded to one partition at a time).
    *
    * @return resulting file count
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): Int = {
    // Resolve FIRST: after a crash mid-swap the table may live at the
    // staged dir until resolveCurrent heals it back to `path` — sizing
    // the unresolved path would throw FileNotFoundException there.
    val current = resolveCurrent(spark, path)
    val p = new org.apache.hadoop.fs.Path(current)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(current)
    if (df.inputFiles.length <= nFiles) return df.inputFiles.length
    swapIn(spark, path, df.coalesce(nFiles))
    spark.read.parquet(path).inputFiles.length
  }

  /** Staged-swap table replacement: write the full replacement to a
    * staging dir FIRST (the current table untouched and readable), then
    * swap via metadata renames. At no instant is the only durable copy
    * of the data gone — a crash leaves at least one complete directory
    * among {path, staged, old}, and `resolveCurrent` picks it up. This
    * is the rewrite primitive for whole-table maintenance (compaction,
    * SCD merge); partition-bounded rewrites use dynamic partition
    * overwrite instead (its commit protocol stages per-partition).
    */
  private[graft] def swapIn(spark: SparkSession, path: String, replacement: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    val (staged, old) = (path + "__staged", path + "__old")
    // Complete a pending swap first: after a crash between the two
    // renames, the complete staged dir is the ONLY durable copy — writing
    // the new stage over it would destroy the table before the
    // replacement exists. The rename is metadata-only and idempotent.
    // Every rename result is checked: a silently-failed rename followed by
    // the deletes below would destroy the only durable copy.
    if (!fs.exists(hp(path)) && fs.exists(hp(staged + "/_SUCCESS"))) {
      require(fs.rename(hp(staged), hp(path)), s"swapIn: healing rename $staged -> $path failed")
      fs.delete(hp(old), true)
    }
    replacement.write.mode(SaveMode.Overwrite).parquet(staged)
    fs.delete(hp(old), true)
    if (fs.exists(hp(path)))
      require(fs.rename(hp(path), hp(old)), s"swapIn: rename $path -> $old failed")
    require(fs.rename(hp(staged), hp(path)), s"swapIn: rename $staged -> $path failed")
    fs.delete(hp(old), true)
  }

  /** The current committed table for a swapIn-maintained path: the main
    * dir normally. After a crash between swapIn's two renames (path moved
    * aside, completed staging dir not yet renamed in — _SUCCESS proves
    * the write finished), the pending swap is COMPLETED here by renaming
    * staged into place, and `path` is returned: handing out the staged
    * dir instead would wedge the next swapIn, which overwrites that same
    * dir while the caller's plan is still reading it. Falls back to the
    * old dir when the staged write never committed. Returns `path`
    * (possibly nonexistent) when none are present.
    */
  private[graft] def resolveCurrent(spark: SparkSession, path: String): String = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    if (fs.exists(hp(path))) path
    else if (fs.exists(hp(path + "__staged/_SUCCESS"))) {
      require(
        fs.rename(hp(path + "__staged"), hp(path)),
        s"resolveCurrent: healing rename ${path}__staged -> $path failed")
      fs.delete(hp(path + "__old"), true)
      path
    } else if (fs.exists(hp(path + "__old"))) path + "__old"
    else path
  }

  private[graft] def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
