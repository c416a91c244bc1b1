package graft

import graft.multimodal.{PngCodec, PixelPipeline}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure-JVM PNG codec: lossless roundtrip through every
  * scanline filter type, structural rejection (bad CRC, truncation,
  * unsupported layouts), and the channel-sum arithmetic the
  * `q_media_pixels` oracle replays.
  */
class PngCodecSpec extends AnyFunSuite {

  private def pix(w: Int, h: Int)(f: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      out((y * w + x) * 3 + c) = (f(x, y, c) & 0xff).toByte
    out
  }

  test("roundtrip is lossless and exercises all five filter types") {
    // h >= 5 makes the encoder's y%5 cycle hit filters 0..4 at least
    // once; pseudo-random content defeats accidental filter no-ops.
    val (w, h) = (23, 11)
    val p = pix(w, h)((x, y, c) => (x * 31 + y * 57 + c * 91 + (x * y) % 13) % 256)
    val png = PngCodec.encode(w, h, p)
    val img = PngCodec.decode(png).getOrElse(fail("decode returned None"))
    assert(img.width == w && img.height == h)
    assert(java.util.Arrays.equals(img.pixels, p), "pixels must roundtrip bit-for-bit")
  }

  test("1-pixel and 1-column edge frames roundtrip (no left/up neighbors)") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1))) {
      val p = pix(w, h)((x, y, c) => x + 17 * y + 29 * c)
      val img = PngCodec.decode(PngCodec.encode(w, h, p)).getOrElse(fail(s"decode None at ${w}x$h"))
      assert(img.width == w && img.height == h && java.util.Arrays.equals(img.pixels, p))
    }
  }

  test("corrupted chunk CRC, truncation, and bad signature are rejected, not mis-decoded") {
    val png = PngCodec.encode(8, 8, pix(8, 8)((x, y, c) => x + y + c))
    // Flip one IDAT payload byte: chunk CRC must catch it.
    val bad = png.clone()
    bad(png.length - 20) = (bad(png.length - 20) ^ 0x41).toByte
    assert(PngCodec.decode(bad).isEmpty, "bit flip must fail the chunk CRC")
    assert(PngCodec.decode(png.take(png.length - 7)).isEmpty, "truncated stream")
    val sig = png.clone(); sig(0) = 0x42
    assert(PngCodec.decode(sig).isEmpty, "bad signature")
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("unsupported layouts (16-bit, non-RGB color types) return None") {
    val png = PngCodec.encode(4, 4, pix(4, 4)((_, _, _) => 7))
    // IHDR body starts at offset 16: width(4) height(4) depth(1) color(1).
    def patched(off: Int, v: Byte): Array[Byte] = {
      val b = png.clone()
      b(off) = v
      // recompute the IHDR chunk CRC (tag at 12, 4+13 bytes)
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 17)
      val v32 = crc.getValue.toInt
      for (i <- 0 until 4) b(29 + i) = ((v32 >>> (8 * (3 - i))) & 0xff).toByte
      b
    }
    assert(PngCodec.decode(patched(24, 16)).isEmpty, "16-bit depth unsupported")
    assert(PngCodec.decode(patched(25, 6)).isEmpty, "RGBA unsupported (would mis-stride)")
  }

  test("channel sums match the generator formula the oracle replays") {
    val id = 42L
    val (w, h) = (PixelPipeline.pxW(id), PixelPipeline.pxH(id))
    val p = pix(w, h)((x, y, c) => PixelPipeline.pxVal(id, x, y, c))
    val img = PngCodec.decode(PngCodec.encode(w, h, p)).get
    val (sr, sg, sb) = img.channelSums
    def expect(c: Int): Long =
      (for (y <- 0 until h; x <- 0 until w) yield PixelPipeline.pxVal(id, x, y, c).toLong).sum
    assert((sr, sg, sb) == ((expect(0), expect(1), expect(2))))
  }
}
