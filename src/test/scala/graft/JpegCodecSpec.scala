package graft

import graft.multimodal.{JpegCodec, PixelPipeline}

/** Baseline JPEG codec (r17): the exactness contract the oracle leans
  * on (block-constant content roundtrips bit-exactly through the
  * GENERAL decode path), the ordinary lossy tolerance contract, and
  * loud failure on everything outside the supported envelope.
  */
class JpegCodecSpec extends SparkSpec {

  /** Deterministic pseudo-random byte (no RNG — repeatable). */
  private def noise(i: Int): Int = ((i * 2654435761L >>> 8) % 256).toInt

  test("block-constant content roundtrips exactly through the general decoder") {
    val (bw, bh) = (4, 3)
    val w = bw * 8; val h = bh * 8
    val rgb = new Array[Byte](w * h * 3)
    for (by <- 0 until bh; bx <- 0 until bw; j <- 0 until 64) {
      val (r, g, b) = PixelPipeline.jpgRgb(42L, bx, by)
      val o = ((by * 8 + j / 8) * w + bx * 8 + j % 8) * 3
      rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
    }
    val img = JpegCodec.decode(JpegCodec.encode(w, h, rgb)).get
    assert(img.width == w && img.height == h)
    // expected pixel = the codec's own fixed-point YCbCr roundtrip of
    // the block color (the DC-only path is exact; see JpegCodec doc)
    for (by <- 0 until bh; bx <- 0 until bw) {
      val (r, g, b) = PixelPipeline.jpgRgb(42L, bx, by)
      val (y, cb, cr) = JpegCodec.rgbToYcbcr(r, g, b)
      val (er, eg, eb) = JpegCodec.ycbcrToRgb(y, cb, cr)
      for (j <- 0 until 64) {
        val o = ((by * 8 + j / 8) * w + bx * 8 + j % 8) * 3
        assert((img.pixels(o) & 0xff) == er && (img.pixels(o + 1) & 0xff) == eg &&
          (img.pixels(o + 2) & 0xff) == eb,
          s"block ($bx,$by) pixel $j: got (${img.pixels(o) & 0xff},${img.pixels(o + 1) & 0xff},${img.pixels(o + 2) & 0xff}) want ($er,$eg,$eb)")
      }
    }
  }

  test("arbitrary content roundtrips within the quality-100 loss bound") {
    // Non-block-multiple dims exercise edge replication + crop; noise
    // content exercises real AC Huffman coding (runs, ZRL, EOB) and
    // the full IDCT path.
    val (w, h) = (21, 13)
    val rgb = Array.tabulate(w * h * 3)(i => noise(i).toByte)
    val img = JpegCodec.decode(JpegCodec.encode(w, h, rgb)).get
    assert(img.width == w && img.height == h)
    var maxErr = 0
    for (i <- 0 until w * h * 3)
      maxErr = math.max(maxErr, math.abs((img.pixels(i) & 0xff) - (rgb(i) & 0xff)))
    info(s"max per-channel roundtrip error at quant=1: $maxErr")
    // All-ones quantization: DCT rounding ±0.5/coef and the fixed-point
    // color roundtrip bound the error to single digits; 8 is the
    // regression ceiling, not the typical value.
    assert(maxErr <= 8, s"lossy roundtrip error too large: $maxErr")
  }

  test("smooth gradient content stays near-lossless") {
    val (w, h) = (16, 16)
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      ((x * 4 + y * 4 + i % 3) % 256).toByte
    }
    val img = JpegCodec.decode(JpegCodec.encode(w, h, rgb)).get
    var maxErr = 0
    for (i <- 0 until w * h * 3)
      maxErr = math.max(maxErr, math.abs((img.pixels(i) & 0xff) - (rgb(i) & 0xff)))
    assert(maxErr <= 3, s"smooth-content error too large: $maxErr")
  }

  test("malformed inputs fail loudly, never mis-decode") {
    val good = JpegCodec.encode(16, 8, Array.tabulate(16 * 8 * 3)(i => noise(i).toByte))
    assert(JpegCodec.decode(good).isDefined)
    // not a JPEG
    assert(JpegCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
    // progressive SOF2 rejected: flip the SOF0 marker byte
    val sof = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val prog = good.clone(); prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty, "progressive must be rejected, not mis-decoded")
    // truncated scan: cut well inside the entropy data
    assert(JpegCodec.decode(good.take(good.length - 8)).isEmpty)
  }

  test("q_media_pixels_jpeg: every JPEG asset decodes (no n_px = -1 rows)") {
    val rows = SparkEntry.queries("q_media_pixels_jpeg")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) > 0), "a JPEG asset failed to decode")
    // dims are the generator's block-multiples
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8 * PixelPipeline.jpgBw(id) && r.getInt(2) == 8 * PixelPipeline.jpgBh(id))
    }
  }

  test("emitted bitstream is ordinary JFIF: markers present and well-ordered") {
    val b = JpegCodec.encode(8, 8, Array.fill(8 * 8 * 3)(77.toByte))
    def idx(m: Int): Int = b.indexOfSlice(Seq(0xff.toByte, m.toByte))
    assert((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8, "SOI first")
    assert(idx(0xe0) == 2, "APP0/JFIF follows SOI")
    assert(idx(0xdb) > 0 && idx(0xc0) > idx(0xdb), "DQT before SOF0")
    assert(idx(0xc4) > idx(0xc0) && idx(0xda) > idx(0xc4), "DHT before SOS")
    assert((b(b.length - 2) & 0xff) == 0xff && (b(b.length - 1) & 0xff) == 0xd9, "EOI last")
  }
}
