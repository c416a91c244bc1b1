package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the lake-maintenance pass every 100 TB
  * deployment runs continuously: streaming ingest, repair patches, and
  * per-partition appends (ParquetSink, ShardExport's epoch output)
  * accumulate files far below the scan-efficient size, and a directory
  * of a million 1 MB files costs ~1000× the driver listing/footer
  * overhead of the same bytes in 128 MB files, defeats row-group
  * pruning, and caps scan parallelism at tiny tasks.
  *
  * `compact` rewrites a parquet directory into ⌈bytes/target⌉ files:
  * - keyless: round-robin repartition — pure bin-packing, no shuffle
  *   skew regardless of content;
  * - keyed: RANGE repartition on the key, so each output file owns a
  *   contiguous key range and its parquet min/max footer stats become
  *   selective again — compaction doubles as the data-layout
  *   (clustering) pass that makes downstream key-predicate scans skip
  *   whole files. The spec pins the disjoint-range property.
  *
  * The write lands in a fresh directory (never in place): an in-place
  * rewrite that dies mid-run loses committed data; the caller swaps
  * directories after the _SUCCESS marker appears, mirroring the
  * Artifacts staging+rename contract.
  *
  * Scale shape: one scan, one exchange (round-robin or range sampling),
  * one write — the minimum physically possible for a rewrite. Output
  * file sizing derives from the INPUT's measured bytes, not a row-count
  * guess, so compression-ratio drift can't silently produce 2 GB files.
  */
object Compaction {

  /** Lake-standard output target (the parquet row-group sweet spot). */
  val TargetFileBytes: Long = 128L * 1024 * 1024

  final case class Report(
      filesBefore: Long, bytesBefore: Long, filesAfter: Long, targetBytes: Long)

  /** Parquet data files under a directory (ignores _SUCCESS/_metadata). */
  private def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.toString, st.getLen))
  }

  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      key: Option[String] = None,
      targetBytes: Long = TargetFileBytes): Report = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val files = dataFiles(spark, inDir)
    val totalBytes = files.map(_._2).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val repart = key match {
      case Some(k) => df.repartitionByRange(nOut, col(k))
      case None    => df.repartition(nOut)
    }
    repart.write.mode(SaveMode.ErrorIfExists).parquet(outDir)
    Report(files.size.toLong, totalBytes, dataFiles(spark, outDir).size.toLong, targetBytes)
  }
}
