package graft

import org.apache.spark.sql.functions._

/** Compaction: file counts collapse to the byte-derived target, content
  * survives as a multiset, and keyed mode restores disjoint key ranges
  * per file (the data-skipping layout).
  */
class CompactionSpec extends SparkSpec {

  private def contentFingerprint(dir: String): (Long, Long) = {
    val df = spark.read.parquet(dir)
    val r = df.agg(
      count(lit(1)).as("n"),
      sum(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L))).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("compact collapses a small-file directory and preserves content exactly") {
    val in = java.nio.file.Files.createTempDirectory("compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("compact_out").toString + "/c"
    // plant the disease: 64 tiny files
    Tables.documents(spark, sfDir).repartition(64).write.mode("overwrite").parquet(in)
    val before = contentFingerprint(in)
    val report = graft.sources.Compaction.compact(spark, in, out, targetBytes = 1L << 20)
    assert(report.filesBefore == 64, s"planting failed: ${report.filesBefore} files")
    assert(report.filesAfter < 64 && report.filesAfter >= 1)
    // sizing is byte-derived: ceil(bytes/target)
    val want = math.max(1L, (report.bytesBefore + (1L << 20) - 1) / (1L << 20))
    assert(report.filesAfter == want,
      s"output files ${report.filesAfter} != byte-derived target $want")
    assert(contentFingerprint(out) == before, "compaction changed the data")
  }

  test("keyed compaction produces disjoint key ranges per output file") {
    val in = java.nio.file.Files.createTempDirectory("compact_kin").toString
    val out = java.nio.file.Files.createTempDirectory("compact_kout").toString + "/c"
    Tables.documents(spark, sfDir).repartition(32).write.mode("overwrite").parquet(in)
    graft.sources.Compaction.compact(spark, in, out, key = Some("doc_id"), targetBytes = 64L << 10)
    val perFile = spark.read.parquet(out)
      .select(col("doc_id"), input_file_name().as("f"))
      .groupBy("f").agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length > 1, "need multiple output files to test range disjointness")
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping key ranges across files: $perFile")
      case _ =>
    }
  }

  test("compact refuses to overwrite an existing output directory") {
    val in = java.nio.file.Files.createTempDirectory("compact_rin").toString
    val out = java.nio.file.Files.createTempDirectory("compact_rout").toString
    Tables.documents(spark, sfDir).limit(10).write.mode("overwrite").parquet(in)
    intercept[Exception] {
      graft.sources.Compaction.compact(spark, in, out)
    }
  }
}
