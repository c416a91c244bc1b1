package graft

import graft.sources.ShardExport
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class ShardExportSpec extends SparkSpec {

  test("export lands split-partitioned, size-bounded, deterministic shards") {
    val out = Files.createTempDirectory("shard_export").toString
    val packed = ShardExport.packedWithSplits(spark, sfDir)
    ShardExport.export(packed, out, shardsPerSplit = 4, maxRecordsPerFile = 50)
    // split directory layout exists for every split present in the data
    val splits = packed.select("split").distinct().collect().map(_.getString(0)).toSet
    for (s <- splits)
      assert(Files.exists(Paths.get(s"$out/split=$s")), s"missing split dir $s")
    // every parquet file respects the record bound
    val files = Files.walk(Paths.get(out)).iterator()
    val parquets = scala.collection.mutable.ArrayBuffer.empty[String]
    while (files.hasNext) {
      val p = files.next().toString
      if (p.endsWith(".parquet")) parquets += p
    }
    assert(parquets.nonEmpty)
    for (f <- parquets) {
      val n = spark.read.parquet(f).count()
      assert(n <= 50, s"$f holds $n rows > maxRecordsPerFile")
    }
    // round-trip: the exported lake equals the input frame exactly
    val back = spark.read.parquet(out)
    assert(back.count() == packed.count())
    assert(back.select(packed.columns.map(col): _*).exceptAll(packed).count() == 0)
    assert(packed.exceptAll(back.select(packed.columns.map(col): _*)).count() == 0)
    // shard files are internally sorted by (pack_id, pack_offset)
    for (f <- parquets.take(3)) {
      val rows = spark.read.parquet(f).select("pack_id", "pack_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)), s"$f is not internally sorted")
    }
  }
}
