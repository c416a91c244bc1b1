package graft

import graft.sources.ParquetSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ParquetSinkSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_sink").toString

  test("upsert-by-anti-join is idempotent") {
    val path = tmp() + "/events"
    val batch = Tables.events(spark, sfDir).limit(100)
    val first = ParquetSink.upsertByAntiJoin(spark, batch, path, Seq("event_id"))
    assert(first == 100)
    val rerun = ParquetSink.upsertByAntiJoin(spark, batch, path, Seq("event_id"))
    assert(rerun == 0, "re-ingesting the same batch must append nothing")
    assert(spark.read.parquet(path).count() == 100)
  }

  test("upsert appends only unseen keys from a mixed batch") {
    val path = tmp() + "/events"
    val all = Tables.events(spark, sfDir).orderBy("event_id").limit(150)
    ParquetSink.upsertByAntiJoin(spark, all.limit(100), path, Seq("event_id"))
    val appended = ParquetSink.upsertByAntiJoin(spark, all, path, Seq("event_id"))
    assert(appended == 50, s"only the 50 new events append, got $appended")
    assert(spark.read.parquet(path).select("event_id").distinct().count() == 150)
  }

  test("partitioned write produces partition directories and dynamic overwrite replaces only touched ones") {
    val path = tmp() + "/by_type"
    val events = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    ParquetSink.writePartitioned(events, path, Seq("event_type"))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=")), s"expected hive-style partition dirs, got $dirs")
    val nonClickBefore = spark.read.parquet(path).filter(col("event_type") =!= "click").count()
    // Dynamic overwrite of ONE partition's data leaves others intact.
    val clicksOnly = events.filter(col("event_type") === "click").limit(10)
    ParquetSink.writePartitioned(clicksOnly, path, Seq("event_type"), overwritePartitions = true)
    val after = spark.read.parquet(path)
    assert(after.filter(col("event_type") === "click").count() == 10)
    assert(after.filter(col("event_type") =!= "click").count() == nonClickBefore,
      "untouched partitions must survive dynamic overwrite")
  }

  test("patch-back fills only NULL cells, bounds the rewrite, and re-runs as a no-op") {
    import spark.implicits._
    val path = tmp() + "/matches"
    // region-partitioned sink with NULL result/timeline holes
    Seq(
      (1L, "euw", Some(10.0), Some("t1")),
      (2L, "euw", None, Some("t2")),
      (3L, "euw", Some(30.0), None),
      (4L, "na", None, None),
      (5L, "na", Some(50.0), Some("t5")),
      (6L, "kr", Some(60.0), Some("t6")) // complete partition: must not be rewritten
    ).toDF("match_id", "region", "result", "timeline")
      .write.partitionBy("region").parquet(path)
    val krFilesBefore = new java.io.File(path + "/region=kr").listFiles().map(_.getName).toSet
    val repair = Seq(
      (2L, Some(20.0), Some("t2r")),
      (2L, Some(20.0), None),        // duplicate-key attempt: must NOT fan out sink rows
      (3L, Some(99.0), Some("t3r")), // result non-null in sink: must NOT be clobbered
      (4L, Some(40.0), None)         // partial repair: timeline stays null
    ).toDF("match_id", "result", "timeline")
    val n = ParquetSink.patchIncomplete(spark, path, repair, Seq("match_id"), Seq("result", "timeline"), "region")
    assert(n == 3, s"rows 2,3,4 get at least one cell patched, got $n")
    val after = spark.read.parquet(path).orderBy("match_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(after == Seq(
      (1L, Some(10.0), Some("t1")),
      (2L, Some(20.0), Some("t2")),  // existing timeline wins over repair
      (3L, Some(30.0), Some("t3r")), // existing result wins, null timeline patched
      (4L, Some(40.0), None),
      (5L, Some(50.0), Some("t5")),
      (6L, Some(60.0), Some("t6"))), s"unexpected table state: $after")
    // patched rows left the incomplete scan; only row 4's timeline remains
    val stillIncomplete = ParquetSink.incompleteRecords(spark.read.parquet(path), Seq("result", "timeline"))
    assert(stillIncomplete.collect().map(_.getLong(0)).toSeq == Seq(4L))
    // untouched partition was not rewritten
    assert(new java.io.File(path + "/region=kr").listFiles().map(_.getName).toSet == krFilesBefore,
      "complete partitions must not be rewritten")
    // idempotent: same batch again patches nothing and leaves state identical
    val again = ParquetSink.patchIncomplete(spark, path, repair, Seq("match_id"), Seq("result", "timeline"), "region")
    assert(again == 0, "re-running the same repair batch must be a no-op")
    val after2 = spark.read.parquet(path).orderBy("match_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(after2 == after)
  }

  test("compaction reduces file count, preserves content, and re-runs as a no-op") {
    val path = tmp() + "/frag"
    val events = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    events.repartition(32).write.parquet(path)
    val before = spark.read.parquet(path)
    assert(before.inputFiles.length == 32)
    val content = before.collect().map(_.toSeq).toSet
    val n = ParquetSink.compact(spark, path)
    assert(n < 32, s"compaction must reduce file count, got $n")
    assert(spark.read.parquet(path).collect().map(_.toSeq).toSet == content, "content must survive")
    assert(ParquetSink.compact(spark, path) == n, "already-compacted sink is a no-op")
  }

  test("resolveCurrent survives every crash window of a swap commit") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val path = tmp() + "/t"
    Seq(1L, 2L).toDF("id").write.parquet(path)
    // normal swap: replacement visible at path, scratch dirs gone
    graft.sources.ParquetSink.swapIn(spark, path, Seq(10L, 20L, 30L).toDF("id"))
    assert(graft.sources.ParquetSink.resolveCurrent(spark, path) == path)
    assert(spark.read.parquet(path).count() == 3)
    // crash window: replacement fully staged (_SUCCESS proves the write
    // finished), path already moved aside -> resolveCurrent COMPLETES the
    // pending swap: staged renamed into place, __old consumed, and `path`
    // (not the staged dir) handed out, so the next swapIn can't overwrite
    // a directory a caller's plan is still reading.
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(1L, 2L, 3L, 4L).toDF("id").write.parquet(path + "__staged")
    fs.rename(new Path(path), new Path(path + "__old"))
    assert(graft.sources.ParquetSink.resolveCurrent(spark, path) == path)
    assert(spark.read.parquet(path).count() == 4)
    assert(!fs.exists(new Path(path + "__staged")), "healing must consume the staged dir")
    assert(!fs.exists(new Path(path + "__old")), "healing must remove the superseded old dir")
    // crash window: staged write never committed (no _SUCCESS) -> the old
    // dir wins and nothing is promoted (an incomplete stage never heals).
    Seq(9L).toDF("id").write.parquet(path + "__staged")
    fs.delete(new Path(path + "__staged/_SUCCESS"), false)
    fs.rename(new Path(path), new Path(path + "__old"))
    assert(graft.sources.ParquetSink.resolveCurrent(spark, path) == path + "__old")
    assert(spark.read.parquet(path + "__old").count() == 4)
    assert(fs.exists(new Path(path + "__staged")), "incomplete stage must be left untouched")
  }

  test("swapIn completes a pending crashed swap before staging a new replacement") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val path = tmp() + "/t"
    // crashed state: no main dir; a COMPLETE staged dir is the only durable
    // copy. swapIn must promote it BEFORE its Overwrite write reuses the
    // staged dir — otherwise the table is destroyed before the replacement
    // exists.
    Seq(1L, 2L, 3L, 4L).toDF("id").write.parquet(path + "__staged")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(path + "__staged/_SUCCESS")))
    graft.sources.ParquetSink.swapIn(spark, path, Seq(10L).toDF("id"))
    assert(spark.read.parquet(path).collect().map(_.getLong(0)).toSeq == Seq(10L))
    assert(!fs.exists(new Path(path + "__staged")), "swap must consume the staged dir")
    assert(!fs.exists(new Path(path + "__old")), "swap must clean up the old dir")
  }

  test("patch-back refuses a repair touching more partitions than the driver-collect cap") {
    import spark.implicits._
    val path = tmp() + "/wide"
    Seq(
      (1L, "p1", None: Option[Double]),
      (2L, "p2", None),
      (3L, "p3", None)
    ).toDF("id", "part", "value").write.partitionBy("part").parquet(path)
    val repair = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "value")
    val err = intercept[IllegalArgumentException] {
      ParquetSink.patchIncomplete(spark, path, repair, Seq("id"), Seq("value"), "part", maxPartitions = 2)
    }
    assert(err.getMessage.contains("more than 2 distinct"), s"unexpected message: ${err.getMessage}")
    // and nothing was rewritten: all cells still NULL
    assert(spark.read.parquet(path).filter(col("value").isNotNull).count() == 0)
  }

  test("the patch slice reads only affected partition directories (partition pruning)") {
    import spark.implicits._
    val path = tmp() + "/pruned"
    Seq(
      (1L, "euw", None: Option[Double]),
      (2L, "na", Some(2.0)),
      (3L, "kr", Some(3.0))
    ).toDF("id", "region", "value").write.partitionBy("region").parquet(path)
    val existing = spark.read.parquet(path)
    assert(existing.inputFiles.length == 3, "sanity: one file per partition dir")
    val slice = ParquetSink.partitionSlice(existing, "region", Seq("euw"))
    slice.collect()
    // inputFiles ignores filters, so the pruning witness is the executed
    // scan node's numFiles metric: a pruned read lists ONE file; a
    // widened read path (e.g. wrapping the partition column in an
    // expression) would scan all three and fail here.
    val scans = slice.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet scan node")
    assert(scans.map(_.metrics("numFiles").value).sum == 1,
      s"pruned slice must read exactly the affected partition's file, got ${scans.map(_.metrics("numFiles").value).sum}")
  }

  test("incomplete-records scan pushes the null filter down") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "payload")
    val inc = ParquetSink.incompleteRecords(df, Seq("payload"))
    assert(inc.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
