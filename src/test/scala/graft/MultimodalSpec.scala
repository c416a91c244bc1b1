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

  test("header parsers decode synthesized PNG/JPEG/WAV bytes exactly") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 640x480
    val png = hexBytes("89504E470D0A1A0A0000000D49484452" + "00000280" + "000001E0" + "0802000000")
    assert(BinaryPipeline.pngDims(png).contains((640, 480)))
    // JPEG with an APP0 segment before SOF0, 320x200 (height first in SOF)
    val jpeg = hexBytes("FFD8" + "FFE00004AABB" + "FFC0001108" + "00C8" + "0140" + "03011100021101031101")
    assert(BinaryPipeline.jpegDims(jpeg).contains((320, 200)))
    // WAV 44100 Hz stereo
    val wav = hexBytes("524946462400000057415645666D742010000000" + "0100" + "0200" + "44AC0000" + "88580100" + "04001000" + "6461746100000000")
    assert(BinaryPipeline.wavInfo(wav).contains((44100, 2)))
    // real-world container quirks: JPEG fill bytes before the marker,
    // WAV with a JUNK chunk before fmt
    val jpegPadded = hexBytes("FFD8" + "FFFF" + "FFC0001108" + "00C8" + "0140" + "03011100021101031101")
    assert(BinaryPipeline.jpegDims(jpegPadded).contains((320, 200)))
    val wavJunk = hexBytes("524946462400000057415645" + "4A554E4B" + "04000000" + "AABBCCDD" +
      "666D742010000000" + "0100" + "0200" + "44AC0000" + "88580100" + "04001000")
    assert(BinaryPipeline.wavInfo(wavJunk).contains((44100, 2)))
    // MP4: ftyp + moov{mvhd ts=1000 dur=5000, trak{tkhd 640x480 16.16}},
    // with a free box before moov and trailing body bytes after it
    val matrix = "000100000000000000000000" + "000000000001000000000000" + "000000000000000040000000"
    val mvhd = "0000006C6D766864" + "00000000" + "00000000" + "00000000" + "000003E8" + "00001388" +
      "00010000" + "0100" + "00000000000000000000" + matrix + ("0" * 48) + "00000002"
    val tkhd = "0000005C746B6864" + "00000007" + "00000000" + "00000000" + "00000001" + "00000000" +
      "00001388" + "0000000000000000" + "0000" + "0000" + "0000" + "0000" + matrix +
      "0280" + "0000" + "01E0" + "0000"
    val mp4 = hexBytes("000000106674797069736F6D00000000" + "0000000C66726565AABBCCDD" +
      "000000D86D6F6F76" + mvhd + "000000647472616B" + tkhd + "DEADBEEF")
    assert(BinaryPipeline.mp4Info(mp4).contains((640, 480, 5000L)))
    // MP4 version-1 headers (64-bit creation/modification/duration):
    // mvhd v1 moves timescale to +28 / 8-byte duration to +32, tkhd v1
    // shifts width/height by 12 — real-world long-lived files use these
    val mvhd1 = "000000786D766864" + "01000000" + ("0" * 32) + "000003E8" +
      "0000000000001388" + ("0" * 160)
    val tkhd1 = "00000068746B6864" + "01000000" + ("0" * 32) + "00000001" + "00000000" +
      "0000000000001388" + "0000000000000000" + "0000" + "0000" + "0000" + "0000" + matrix +
      "02800000" + "01E00000"
    val mp4v1 = hexBytes("000000106674797069736F6D00000000" +
      "000000F06D6F6F76" + mvhd1 + "000000707472616B" + tkhd1)
    assert(BinaryPipeline.mp4Info(mp4v1).contains((640, 480, 5000L)),
      s"v1 layout parse failed: ${BinaryPipeline.mp4Info(mp4v1)}")
    // garbage falls back to raw, never throws
    assert(BinaryPipeline.decodeBatch(Seq((1L, "video", Array[Byte](1, 2, 3)))).head.format == "raw")
  }

  test("mediaPrep plans aspect-fit resizes and frameSamples expands exactly the 1-fps plan") {
    val prep = SparkEntry.queries("q_media_prep")(spark, sfDir)
    // every visual asset fits with max dimension pinned to 224 and the
    // other in (0, 224]; audio plans nothing
    assert(prep.filter(col("kind").isin("image", "video") &&
      greatest(col("dst_w"), col("dst_h")) =!= 224).count() == 0)
    assert(prep.filter(col("kind").isin("image", "video") &&
      (least(col("dst_w"), col("dst_h")) <= 0 || least(col("dst_w"), col("dst_h")) > 224)).count() == 0)
    assert(prep.filter(col("kind") === "audio" &&
      (col("dst_w") =!= 0 || col("n_frames") =!= 0 || col("n_tokens") =!= 0)).count() == 0)
    // token budget is patches x frames, recomputed independently
    assert(prep.filter(col("n_tokens") =!=
      ((col("dst_w") + 15) / 16).cast("long") * ((col("dst_h") + 15) / 16).cast("long") * col("n_frames"))
      .count() == 0)
    val feats = BinaryPipeline.pipeline(spark, sfDir)
    val frames = BinaryPipeline.frameSamples(feats)
    // exactly n_frames rows per video, 1000 ms apart, inside the duration
    val perVid = frames.groupBy("media_id").agg(
      count(lit(1)).as("n"), max("ts_ms").as("last_ts"))
    val joined = prep.filter(col("kind") === "video").join(perVid, "media_id")
    assert(joined.filter(col("n") =!= col("n_frames")).count() == 0, "frame count != plan")
    val withDur = frames.join(feats.select(col("media_id"), col("duration_ms").as("dur")), "media_id")
    assert(withDur.filter(col("ts_ms") > col("dur")).count() == 0, "sampled past the end")
    assert(frames.filter(pmod(col("ts_ms"), lit(1000)) =!= 0).count() == 0)
  }

  test("pipeline decodes real dimensions/rates from the synthesized headers") {
    val feats = BinaryPipeline.pipeline(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(feats.count() == docs, "every asset must decode")
    // every image decodes to the dimensions its header encodes
    val badImg = feats.filter(col("kind") === "image").filter(
      !col("format").isin("png", "jpeg") ||
        col("width") =!= (lit(16) + pmod(col("media_id"), lit(1024))) ||
        col("height") =!= (lit(16) + pmod(col("media_id"), lit(768))))
    assert(badImg.count() == 0, "image header decode mismatch")
    val badAud = feats.filter(col("kind") === "audio").filter(
      col("format") =!= "wav" ||
        col("sample_rate") =!= (lit(8000) + pmod(col("media_id"), lit(8)) * 4000) ||
        col("channels") =!= (lit(1) + pmod(col("media_id"), lit(2))))
    assert(badAud.count() == 0, "wav header decode mismatch")
    // every video decodes to the dims/duration its ISO-BMFF boxes encode
    val badVid = feats.filter(col("kind") === "video").filter(
      col("format") =!= "mp4" ||
        col("width") =!= (lit(160) + pmod(col("media_id"), lit(1280))) ||
        col("height") =!= (lit(120) + pmod(col("media_id"), lit(720))) ||
        col("duration_ms") =!= (lit(1) + pmod(col("media_id"), lit(59))) * 1000)
    assert(badVid.count() == 0, "mp4 box-walk decode mismatch")
    assert(feats.filter(col("format") === "raw").count() == 0, "no undecoded assets remain")
    assert(feats.filter(col("n_bytes") <= 0).count() == 0)
    val again = BinaryPipeline.pipeline(spark, sfDir)
    assert(feats.exceptAll(again).count() == 0, "decode must be deterministic")
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
