package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming drift monitor: a corpus-like epoch stays quiet; a spam
  * flood epoch flags the planted token as the top mover immediately.
  */
class DriftMonitorSpec extends SparkSpec {

  private def writeLakeFile(df: org.apache.spark.sql.DataFrame, srcDir: String, name: String, mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("driftfile").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(srcDir, name)
    Files.copy(part.toPath, dst.toPath)
    assert(dst.setLastModified(mtime))
  }

  test("drift monitor flags a planted flood within its epoch and stays quiet on corpus-like data") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("drift_src").toString
    val logDir = Files.createTempDirectory("drift_log").toString + "/log"
    val ckpt = Files.createTempDirectory("drift_ckpt").toString

    // epoch 0: a corpus-like batch — real docs from the table itself
    val normal = Tables.documents(spark, sfDir).select("doc_id", "text").limit(60)
    // epoch 1: a spam flood — half real docs, half a repeated junk token
    val flood = Tables.documents(spark, sfDir).select("doc_id", "text").limit(30)
      .unionByName(
        (1000L until 1030L).map(i => (i, Seq.fill(40)("zxspamzx").mkString(" ")))
          .toDF("doc_id", "text"))
    writeLakeFile(normal, srcDir, "e0.parquet", 1000000L)
    writeLakeFile(flood, srcDir, "e1.parquet", 2000000L)

    val q = graft.streaming.DriftMonitor.start(
      spark, srcDir, sfDir, logDir, ckpt, availableNow = true)
    q.awaitTermination()

    val log = spark.read.parquet(logDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byEpoch = log.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L), s"expected 2 epochs, got ${byEpoch.keySet}")

    // flood epoch: the planted token is the single largest mover, with
    // zero baseline rate and a rate near its planted share (~40%)
    val floodTop = byEpoch(1L).maxBy(r => math.abs(r._5))
    assert(floodTop._2 == "zxspamzx", s"flood not flagged: top mover is $floodTop")
    assert(floodTop._4 == 0L, "junk token must have zero baseline rate")
    assert(floodTop._3 > 100000000L, s"flood rate implausibly low: ${floodTop._3}")

    // corpus-like epoch: every mover is far below the flood's drift —
    // sampling noise, not an alarm
    val normalMax = byEpoch(0L).map(r => math.abs(r._5)).max
    assert(normalMax < math.abs(floodTop._5) / 3,
      s"quiet epoch drifts too close to the flood: $normalMax vs ${floodTop._5}")

    // drift is exactly rate - base everywhere
    assert(log.forall { case (_, _, r, b, d) => d == r - b }, "drift arithmetic broken")
  }
}
