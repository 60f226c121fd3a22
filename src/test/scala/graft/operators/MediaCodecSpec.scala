package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{MediaCodec, MediaRecord}

/** Byte-level media codecs (round-8 verdict ask #5): pure-JVM BMP/PPM/WAV
  * decode with no codec libraries. The encode side exists so tests (and the
  * mm_decode contract query) can synthesize REAL bytes in-corpus. */
class MediaCodecSpec extends AnyFunSuite {

  private def rgbPattern(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { p =>
      val px = p / 3; val c = p % 3
      ((px * 37 + c * 11) % 256).toByte
    }

  test("BMP round-trip recovers dimensions and pixels at every row-padding width") {
    for (w <- 1 to 9; h <- Seq(1, 3, 5)) { // w*3 mod 4 covers all pad sizes
      val rgb = rgbPattern(w, h)
      val (dw, dh, dpx) = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, rgb))
      assert((dw, dh) == (w, h), s"dims for ${w}x$h")
      assert(dpx.toSeq == rgb.toSeq, s"pixels for ${w}x$h")
    }
  }

  test("BMP negative height (top-down row order) decodes to the same image") {
    val w = 5; val h = 4
    val rgb = rgbPattern(w, h)
    val bottomUp = MediaCodec.encodeBmp(w, h, rgb)
    // flip to top-down: negate height and reverse the stored row order
    val rowSize = (w * 3 + 3) / 4 * 4
    val topDown = bottomUp.clone()
    val nh = -h
    topDown(22) = (nh & 0xff).toByte; topDown(23) = ((nh >> 8) & 0xff).toByte
    topDown(24) = ((nh >> 16) & 0xff).toByte; topDown(25) = ((nh >> 24) & 0xff).toByte
    for (r <- 0 until h)
      System.arraycopy(bottomUp, 54 + (h - 1 - r) * rowSize,
        topDown, 54 + r * rowSize, rowSize)
    assert(MediaCodec.decodeBmp(topDown)._3.toSeq ==
      MediaCodec.decodeBmp(bottomUp)._3.toSeq)
  }

  test("PPM decodes with comments and arbitrary header whitespace") {
    val rgb = rgbPattern(3, 2)
    val header = "P6\n# a comment line\n3   2\n255\n"
    val bytes = header.getBytes ++ rgb
    val (w, h, dpx) = MediaCodec.decodePpm(bytes)
    assert((w, h) == (3, 2))
    assert(dpx.toSeq == rgb.toSeq)
  }

  test("WAV round-trip recovers rate, channels, and every sample; extra chunks skip") {
    val samples = Array.tabulate(47)(i => ((i * 2029 + 7) % 65536 - 32768).toShort)
    val (rate, ch, dsamp) = MediaCodec.decodeWav(MediaCodec.encodeWav(22050, 1, samples))
    assert((rate, ch) == (22050, 1))
    assert(dsamp.toSeq == samples.toSeq)
    // splice a LIST chunk between fmt and data: the chunk walk must skip it
    val plain = MediaCodec.encodeWav(8000, 2, samples)
    val listChunk = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = plain.take(36) ++ listChunk ++ plain.drop(36)
    // RIFF size field grows by the spliced chunk
    val newSize = (plain.length - 8) + listChunk.length
    spliced(4) = (newSize & 0xff).toByte; spliced(5) = ((newSize >> 8) & 0xff).toByte
    spliced(6) = ((newSize >> 16) & 0xff).toByte; spliced(7) = ((newSize >> 24) & 0xff).toByte
    val (r2, c2, s2) = MediaCodec.decodeWav(spliced)
    assert((r2, c2) == (8000, 2))
    assert(s2.toSeq == samples.toSeq)
  }

  test("decode() sniffs real formats; non-media payloads fall back to the stub") {
    val rgb = rgbPattern(4, 3)
    val img = MediaCodec.decode(MediaRecord(1L, "image",
      MediaCodec.encodeBmp(4, 3, rgb), 100L))
    assert((img.width, img.height, img.n_frames) == (4, 3, 1))
    val wav = MediaCodec.decode(MediaRecord(2L, "audio",
      MediaCodec.encodeWav(16000, 1, Array.tabulate(30)(_.toShort)), 100L))
    assert((wav.width, wav.height, wav.n_frames) == (16000, 1, 30))
    // plain text (even starting with BMP/RIFF-like magic) stubs, not throws
    for (txt <- Seq("hello corpus", "BM too short", "RIFF but not a wave at all, really")) {
      val rec = MediaRecord(3L, "image", txt.getBytes, txt.length.toLong)
      val (got, want) = (MediaCodec.decode(rec), MediaCodec.decodeStub(rec))
      assert(got.copy(feature = null).toString == want.copy(feature = null).toString
        && got.feature.toSeq == want.feature.toSeq, txt)
    }
  }
}
