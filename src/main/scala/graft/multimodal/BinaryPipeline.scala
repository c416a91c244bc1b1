package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted per-asset features. The decode step is a STUB (no image
  * libs in this environment) but everything Spark-side — schema,
  * partitioning, batched iteration shape — is real.
  */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    checksum: Long
)

/** Multimodal column pipeline: media as opaque binary columns + typed
  * metadata, with feature extraction as a batched per-partition decode.
  *
  * Layout principles for 100 TB of media:
  * - the payload is ONE binary column next to scalar metadata — never
  *   exploded into rows, never parsed by Catalyst; scans that don't
  *   touch `payload` prune it at the parquet reader.
  * - decode runs in mapPartitions over fixed-size batches (the same
  *   shape as mapInPandas/Arrow batches): one library context per
  *   batch, bounded memory, no per-row JNI churn.
  * - partition count governs decode parallelism independently of
  *   upstream layout (repartition by id before the decode stage).
  */
object BinaryPipeline {

  val DecodeBatchSize = 64

  /** Builds the media table from the documents corpus: payload bytes +
    * typed metadata struct. Stands in for real image/audio blobs.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        // Deterministic fake payload: the utf-8 bytes of the text.
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          when(pmod(col("doc_id"), lit(3)) === 0, "image")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
            .otherwise("video").as("kind"),
          col("source").as("origin"),
          col("n_chars").as("content_hint")
        ).as("meta")
      )

  /** STUB decode: a real build wires an image/audio codec here; the
    * deterministic fake derives width/height/checksum from the bytes so
    * specs can assert exact values. Signature and batching are the real
    * contract: Array[Byte] in, fixed-size batches, features out.
    */
  private[graft] def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, kind, bytes) =>
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * 1315423911L + (bytes(i) & 0xff); i += 1 }
      val w = 16 + (math.abs(h) % 1024).toInt
      MediaFeatures(id, kind, bytes.length.toLong, w, (w * 3) / 4, h)
    }

  /** Feature extraction over the media table: batched mapPartitions
    * decode, output is a typed Dataset with a stable schema.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY)
    media
      .select(col("media_id"), col("meta.kind").as("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap(decodeBatch)
      }
  }

  /** End-to-end: build media table, spread decode across partitions,
    * extract features. Returned sorted for the rows-check.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(spark, dir).repartition(col("media_id"))
    extractFeatures(media).toDF().orderBy("media_id")
  }
}
