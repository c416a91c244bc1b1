package graft

import graft.multimodal.BinaryPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

class MultimodalSpec extends SparkSpec {

  test("media table carries an opaque binary payload with typed metadata") {
    val media = BinaryPipeline.mediaTable(spark, sfDir)
    val schema = media.schema
    assert(schema("payload").dataType == BinaryType)
    assert(schema("meta").dataType.isInstanceOf[StructType])
    assert(media.filter(col("meta.kind").isin("image", "audio", "video")).count() == media.count())
  }

  test("feature extraction is deterministic and total") {
    val docs = Tables.documents(spark, sfDir).count()
    val feats = BinaryPipeline.pipeline(spark, sfDir)
    assert(feats.count() == docs, "every asset must decode")
    val again = BinaryPipeline.pipeline(spark, sfDir)
    assert(feats.exceptAll(again).count() == 0, "decode must be deterministic")
    assert(feats.filter(col("width") < 16 || col("height") < 1).count() == 0)
    assert(feats.filter(col("n_bytes") <= 0).count() == 0)
  }

  test("decode runs in bounded batches") {
    val batch = (1L to 200L).map(i => (i, "image", Array.fill(8)(i.toByte)))
    val out = batch.grouped(BinaryPipeline.DecodeBatchSize).flatMap(BinaryPipeline.decodeBatch(_)).toSeq
    assert(out.size == 200)
    assert(out.map(_.media_id).toSet == batch.map(_._1).toSet)
  }

  test("metadata-only scans prune the payload column") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_media").toString
    BinaryPipeline.mediaTable(spark, sfDir).write.mode("overwrite").parquet(tmp)
    val plan = spark.read.parquet(tmp).select("media_id", "meta").queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), "payload must be pruned from metadata-only scans")
  }
}
