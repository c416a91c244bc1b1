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

  test("incomplete-records scan pushes the null filter down") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "payload")
    val inc = ParquetSink.incompleteRecords(df, Seq("payload"))
    assert(inc.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
