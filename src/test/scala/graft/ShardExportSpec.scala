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

  test("packing concatenates docs in hash-shuffle order, not doc_id order") {
    import graft.operators.SeqPack
    val packed = ShardExport.packedWithSplits(spark, sfDir)
    // Walking a split's packs in (pack_id, pack_offset) order visits
    // docs in shuffle-hash order — crawl-order neighbors must NOT share
    // context windows (r8 shipped docShuffle but the export ignored it).
    val trainSeq = packed.filter(col("split") === "train")
      .orderBy("pack_id", "pack_offset").select("doc_id")
      .collect().map(_.getLong(0))
    assert(trainSeq.length > 10)
    assert(!trainSeq.sameElements(trainSeq.sorted), "export still packs in doc_id order")
    def key(d: Long) = {
      val k = ((d % 1000003L) * ((1315423911L + 2L * SeqPack.ShuffleSalt) % 1000000007L)) % 1000000007L
      (k * k) % 1000000007L
    }
    assert(trainSeq.sameElements(trainSeq.sortBy(d => (key(d), d))),
      "pack order must equal the declared (shuffle_key, doc_id) order")
    // an epoch reshuffle (different salt) reorders the same docs
    val other = ShardExport.packedWithSplits(spark, sfDir, epochSalt = 9001L)
      .filter(col("split") === "train")
      .orderBy("pack_id", "pack_offset").select("doc_id")
      .collect().map(_.getLong(0))
    assert(other.toSet == trainSeq.toSet, "reshuffle must keep the same doc set")
    assert(!other.sameElements(trainSeq), "a new epoch salt must produce a new order")
  }

  test("manifest totals equal the exported frame's totals, one row per shard file") {
    val out = Files.createTempDirectory("shard_manifest").toString
    val packed = ShardExport.packedWithSplits(spark, sfDir)
    ShardExport.export(packed, out, shardsPerSplit = 4, maxRecordsPerFile = 50)
    val man = ShardExport.manifest(spark, out).collect()
    // one manifest row per physical parquet file
    val files = Files.walk(Paths.get(out)).iterator()
    var nFiles = 0
    while (files.hasNext) if (files.next().toString.endsWith(".parquet")) nFiles += 1
    assert(man.length == nFiles, s"${man.length} manifest rows for $nFiles files")
    // a loader bootstrapping from the manifest sees exactly the corpus
    assert(man.map(_.getAs[Long]("n_rows")).sum == packed.count())
    val tokTotal = packed.agg(sum("n_tokens")).head.getLong(0)
    assert(man.map(_.getAs[Long]("total_tokens")).sum == tokTotal)
    // per-split rows agree too (the loader filters the manifest, not files)
    val bySplit = man.groupBy(_.getAs[String]("split")).view.mapValues(_.map(_.getAs[Long]("n_rows")).sum)
    for ((s, n) <- bySplit)
      assert(n == packed.filter(col("split") === s).count(), s"split $s manifest rows drift")
    // packs never straddle shards (only files within a shard task), so
    // per-file pack counts are bounded below by the distinct total
    assert(man.map(_.getAs[Long]("n_packs")).sum >=
      packed.select("split", "pack_id").distinct().count())
  }

  test("shards carry real token-id payloads that decode back to the corpus") {
    import spark.implicits._
    val out = Files.createTempDirectory("shard_ids").toString
    val packed = ShardExport.packedWithSplits(spark, sfDir)
    // n_tokens is the real tokenizer length, not a whitespace estimate
    assert(packed.filter(size(col("token_ids")) =!= col("n_tokens")).count() == 0)
    ShardExport.export(packed, out, shardsPerSplit = 4, maxRecordsPerFile = 50)
    val back = spark.read.parquet(out)
    assert(back.columns.contains("token_ids"), "exported shards lost the id payload")
    // the lake's token grand total equals the manifest's
    val lakeTok = back.agg(sum(size(col("token_ids")))).head.getLong(0)
    val manTok = ShardExport.manifest(spark, out)
      .agg(sum("total_tokens")).head.getLong(0)
    assert(lakeTok == manTok, s"lake tokens $lakeTok != manifest tokens $manTok")
    // and every exported doc's ids decode to its exact source text — the
    // shards are a lossless representation of the corpus
    val texts = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    val sample = back.select($"doc_id", $"token_ids").as[(Long, Seq[Int])].collect()
    assert(sample.nonEmpty)
    for ((id, ids) <- sample)
      assert(graft.functions.Bpe.decode(ids.toArray) == texts(id), s"doc $id payload corrupt")
  }

  test("streaming export: epoch-scoped shard groups, lossless payloads, idempotent epoch retry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("shard_stream").toString
    val ckpt = Files.createTempDirectory("shard_stream_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val query = ShardExport.streamExport(docs, out, ckpt, shardsPerSplit = 2, maxRecordsPerFile = 10)
    try {
      input.addData((1L, "alpha beta gamma delta"), (2L, "one two three"))
      query.processAllAvailable()
      input.addData((3L, "later arriving document text"))
      query.processAllAvailable()
    } finally query.stop()
    // one self-contained shard group per epoch
    assert(Files.exists(Paths.get(s"$out/epoch=0")), "epoch 0 dir missing")
    assert(Files.exists(Paths.get(s"$out/epoch=1")), "epoch 1 dir missing")
    val all = spark.read.option("basePath", out)
      .parquet(s"$out/epoch=0", s"$out/epoch=1")
    assert(all.count() == 3, "every streamed doc lands exactly once")
    // payloads decode losslessly, same as the batch sink
    val got = all.select($"doc_id", $"token_ids").as[(Long, Seq[Int])].collect().toMap
    assert(graft.functions.Bpe.decode(got(1L).toArray) == "alpha beta gamma delta")
    assert(graft.functions.Bpe.decode(got(3L).toArray) == "later arriving document text")
    // pack ids restart per epoch (epoch dirs are self-contained)
    assert(spark.read.parquet(s"$out/epoch=1").select(min("pack_id")).head.getLong(0) == 0L)
    // EXACTLY-ONCE: a replayed epoch (same id, same data — what the
    // checkpoint guarantees on retry) overwrites to identical content
    val before = spark.read.parquet(s"$out/epoch=0")
      .collect().map(_.toSeq).toSet
    ShardExport.exportEpoch(
      Seq((1L, "alpha beta gamma delta"), (2L, "one two three")).toDF("doc_id", "text"),
      0L, out, shardsPerSplit = 2, maxRecordsPerFile = 10)
    val after = spark.read.parquet(s"$out/epoch=0")
      .collect().map(_.toSeq).toSet
    assert(after == before, "epoch retry must replace, not duplicate or alter")
  }
}
