package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{MediaCodec, MediaRecord}

/** Baseline JPEG codec: JPEG is lossy, so round trips are bounded-error,
  * not identity — and the strongest conformance evidence is THIRD-PARTY:
  * the JDK's own ImageIO (javax.imageio, test-side only) must decode our
  * bitstream, and we must decode its (4:2:0-subsampled) output. */
class JpegCodecSpec extends AnyFunSuite {

  /** Smooth two-axis gradient — low-frequency content where DCT
    * quantization error is small and well-understood (no wrap-around
    * sawtooth edges, which would ring). */
  private def gradient(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      rgb(p) = (20 + x * 200 / math.max(1, w)).toByte
      rgb(p + 1) = (20 + y * 200 / math.max(1, h)).toByte
      rgb(p + 2) = (40 + (x + y) * 150 / math.max(1, w + h)).toByte
    }
    rgb
  }

  private def errs(a: Array[Byte], b: Array[Byte]): (Int, Double) = {
    require(a.length == b.length, s"${a.length} vs ${b.length}")
    var maxE = 0; var sum = 0L
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > maxE) maxE = d
      sum += d
      i += 1
    }
    (maxE, sum.toDouble / a.length)
  }

  test("round-trip on smooth gradients stays within quantization error " +
      "across block-aligned and ragged dimensions") {
    for ((w, h) <- Seq((8, 8), (16, 16), (17, 9), (40, 24), (1, 1), (3, 21))) {
      val img = gradient(w, h)
      val (dw, dh, out) = JpegCodec.decode(JpegCodec.encode(w, h, img, quality = 90))
      assert((dw, dh) == (w, h), s"dims for ${w}x$h")
      val (maxE, meanE) = errs(img, out)
      assert(maxE <= 20 && meanE <= 5.0,
        s"${w}x$h reconstruction error too high: max=$maxE mean=$meanE")
    }
  }

  test("flat color reconstructs near-exactly (DC-only blocks)") {
    val w = 24; val h = 16
    val img = Array.tabulate(w * h * 3)(i => (i % 3 match {
      case 0 => 180; case 1 => 90; case _ => 45
    }).toByte)
    val (_, _, out) = JpegCodec.decode(JpegCodec.encode(w, h, img, quality = 85))
    val (maxE, _) = errs(img, out)
    assert(maxE <= 4, s"flat color must be near-exact, max err $maxE")
  }

  test("ARITHMETIC coding (SOF9) is a transparent entropy layer: the " +
      "arithmetic decode is PIXEL-IDENTICAL to the huffman decode of the " +
      "same quantized coefficients, across shapes and noisy content") {
    for ((w, h) <- Seq((8, 8), (16, 16), (17, 9), (40, 24), (1, 1), (3, 21))) {
      val img = gradient(w, h)
      val huff = JpegCodec.decode(JpegCodec.encode(w, h, img, quality = 90))
      val bytes = JpegCodec.encode(w, h, img, quality = 90, arithmetic = true)
      // the stream really is SOF9 with a DAC segment and no DHT
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc9), "missing SOF9")
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xcc), "missing DAC")
      assert(!bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc4),
        "arithmetic stream must carry no huffman tables")
      val arith = JpegCodec.decode(bytes)
      assert(arith._1 == w && arith._2 == h, s"dims for ${w}x$h")
      assert(java.util.Arrays.equals(arith._3, huff._3),
        s"${w}x$h arithmetic decode diverged from the huffman decode")
    }
    // adversarial content: per-pixel noise maximizes AC activity (category
    // chains, long runs, dense EOB decisions, heavy carry traffic)
    val w = 33; val h = 18
    val noisy = Array.tabulate(w * h * 3)(i => ((i * 2654435761L >> 7) & 0xff).toByte)
    val huffN = JpegCodec.decode(JpegCodec.encode(w, h, noisy, quality = 95))
    val arithN = JpegCodec.decode(
      JpegCodec.encode(w, h, noisy, quality = 95, arithmetic = true))
    assert(java.util.Arrays.equals(arithN._3, huffN._3), "noisy-content parity")
    // arithmetic should COMPRESS no worse than huffman on smooth content
    val img = gradient(64, 48)
    val hLen = JpegCodec.encode(64, 48, img, quality = 90).length
    val aLen = JpegCodec.encode(64, 48, img, quality = 90, arithmetic = true).length
    assert(aLen < hLen, s"arithmetic ($aLen B) should beat huffman ($hLen B)")
  }

  test("12-BIT ARITHMETIC sequential: entropy-transparent against the " +
      "12-bit huffman decode, tighter error budget intact") {
    val w = 21; val h = 14
    val img = gradient(w, h)
    val huff12 = JpegCodec.decode(
      JpegCodec.encode(w, h, img, quality = 90, precision = 12))
    val arith12 = JpegCodec.decode(
      JpegCodec.encode(w, h, img, quality = 90, precision = 12, arithmetic = true))
    assert(java.util.Arrays.equals(arith12._3, huff12._3),
      "12-bit arithmetic decode diverged from the 12-bit huffman decode")
    val (maxE, _) = errs(img, arith12._3)
    assert(maxE <= 6, s"12-bit budget: max err $maxE")
  }

  test("PROGRESSIVE ARITHMETIC (SOF10): the successive-approximation scan " +
      "script (DC first Al=1, DC refine, per-component AC first Al=1 + AC " +
      "refine) reassembles the EXACT sequential coefficients — decode is " +
      "pixel-identical to the baseline huffman decode") {
    for ((w, h) <- Seq((8, 8), (16, 16), (17, 9), (40, 24), (1, 1), (3, 21))) {
      val img = gradient(w, h)
      val huff = JpegCodec.decode(JpegCodec.encode(w, h, img, quality = 90))
      val bytes = JpegCodec.encode(w, h, img, quality = 90,
        progressive = true, arithmetic = true)
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xca), "missing SOF10")
      assert(!bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc4),
        "arithmetic progressive must carry no huffman tables")
      // eight scans: DC first + DC refine + 3x (AC first + AC refine)
      val nScans = bytes.sliding(2).count(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
      assert(nScans == 8, s"expected 8 scans, got $nScans")
      val prog = JpegCodec.decode(bytes)
      assert((prog._1, prog._2) == (w, h), s"dims for ${w}x$h")
      assert(java.util.Arrays.equals(prog._3, huff._3),
        s"${w}x$h SOF10 decode diverged from the sequential decode")
    }
    // noisy content stresses the refinement walks (dense newly-nonzero
    // coefficients between corrections) and the per-scan coder restarts
    val w = 33; val h = 18
    val noisy = Array.tabulate(w * h * 3)(i => ((i * 2654435761L >> 7) & 0xff).toByte)
    val huffN = JpegCodec.decode(JpegCodec.encode(w, h, noisy, quality = 95))
    val progN = JpegCodec.decode(JpegCodec.encode(w, h, noisy, quality = 95,
      progressive = true, arithmetic = true))
    assert(java.util.Arrays.equals(progN._3, huffN._3), "noisy SOF10 parity")
  }

  test("arithmetic refusals stay loud where support ends; corrupt " +
      "arithmetic payloads degrade to the stub through decode()") {
    val img = gradient(16, 16)
    intercept[IllegalArgumentException](
      JpegCodec.encode(16, 16, img, arithmetic = true, progressive = true,
        precision = 12))
    intercept[IllegalArgumentException](
      JpegCodec.encode(16, 16, img, arithmetic = true, restartInterval = 2))
    // a DRI segment spliced into an arithmetic stream refuses (decoder
    // restart support is declared out, not silently wrong)
    val bytes = JpegCodec.encode(16, 16, img, arithmetic = true)
    val dri = Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, 2)
    val spliced = bytes.take(2) ++ dri ++ bytes.drop(2)
    val e = intercept[IllegalArgumentException](JpegCodec.decode(spliced))
    assert(e.getMessage.contains("restart"), e.getMessage)
    // byte corruption inside the entropy segment: decode() falls back
    val bad = bytes.clone()
    bad(bytes.length - 8) = (bad(bytes.length - 8) ^ 0x6D).toByte
    val rec = MediaRecord(7L, "image", java.util.Arrays.copyOf(bad, 24), 24L)
    assert(MediaCodec.decode(rec).feature.toSeq ==
      MediaCodec.decodeStub(rec).feature.toSeq)
  }

  test("a crafted SOF9 declaring plane allocations beyond the absolute " +
      "memory budget refuses loudly (no executor-killing OOM)") {
    // r21 ADVICE: the payload-proportional arithmetic bound (512
    // blocks/byte) lets a ~2 MB crafted file declare ~1e9 blocks → ~550 GB
    // of Double planes, and OutOfMemoryError is not NonFatal, so it would
    // bypass the stub fallback. Build a real arithmetic stream with enough
    // entropy payload to clear the proportional bound, then patch the SOF9
    // dimensions to 16000x16000 (12M blocks ≈ 6.1 GiB of planes): the
    // ABSOLUTE 4 GiB plane budget must refuse before allocation.
    var side = 128
    def noisy(n: Int) =
      Array.tabulate(n * n * 3)(i => ((i * 2654435761L >> 7) & 0xff).toByte)
    var bytes = JpegCodec.encode(side, side, noisy(side), quality = 95,
      arithmetic = true)
    while (bytes.length < 24 * 1024 && side < 1024) {
      side *= 2
      bytes = JpegCodec.encode(side, side, noisy(side), quality = 95,
        arithmetic = true)
    }
    assert(bytes.length >= 24 * 1024,
      "precondition: need >= 24 KB of payload so the proportional bound " +
        s"(512 blocks/byte) admits 12M blocks; got ${bytes.length}")
    val i = bytes.indices.find(j => (bytes(j) & 0xff) == 0xff &&
      j + 1 < bytes.length && (bytes(j + 1) & 0xff) == 0xc9).get
    val p = bytes.clone
    p(i + 5) = (16000 >> 8).toByte; p(i + 6) = (16000 & 0xff).toByte // height
    p(i + 7) = (16000 >> 8).toByte; p(i + 8) = (16000 & 0xff).toByte // width
    val e = intercept[IllegalArgumentException](JpegCodec.decode(p))
    assert(e.getMessage.contains("pixel planes"), e.getMessage)
  }

  test("THIRD-PARTY conformance: the JDK's ImageIO decodes our bitstream " +
      "to the same image") {
    val w = 32; val h = 16
    val img = gradient(w, h)
    val bytes = JpegCodec.encode(w, h, img, quality = 90)
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(bi != null, "ImageIO rejected our JPEG bitstream")
    assert(bi.getWidth == w && bi.getHeight == h)
    val theirs = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val px = bi.getRGB(x, y)
      val p = (y * w + x) * 3
      theirs(p) = ((px >> 16) & 0xff).toByte
      theirs(p + 1) = ((px >> 8) & 0xff).toByte
      theirs(p + 2) = (px & 0xff).toByte
    }
    val (maxE, meanE) = errs(img, theirs)
    assert(maxE <= 20 && meanE <= 5.0,
      s"a third-party decode of our stream diverges: max=$maxE mean=$meanE")
  }

  test("THIRD-PARTY conformance: we decode a JDK-encoded JPEG (its " +
      "default 4:2:0 subsampling exercises multi-block MCUs + upsampling)") {
    val w = 33; val h = 17 // ragged on purpose
    val img = gradient(w, h)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      bi.setRGB(x, y, ((img(p) & 0xff) << 16) |
        ((img(p + 1) & 0xff) << 8) | (img(p + 2) & 0xff))
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", buf))
    val (dw, dh, out) = JpegCodec.decode(buf.toByteArray)
    assert((dw, dh) == (w, h))
    val (maxE, meanE) = errs(img, out)
    // chroma subsampling costs more than 4:4:4 — still clearly the image
    assert(maxE <= 48 && meanE <= 8.0,
      s"JDK-encoded JPEG decode diverges: max=$maxE mean=$meanE")
  }

  test("grayscale single-component JPEG decodes to replicated gray") {
    val w = 16; val h = 16
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = 30 + x * 10 + y * 2
      bi.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", buf))
    val (dw, dh, out) = JpegCodec.decode(buf.toByteArray)
    assert((dw, dh) == (w, h))
    for (p <- 0 until w * h)
      assert(out(p * 3) == out(p * 3 + 1) && out(p * 3) == out(p * 3 + 2),
        "grayscale must replicate to (g,g,g)")
  }

  test("restart markers (DRI + RSTn every N MCUs): round-trip equals the " +
      "marker-free encoding and a third-party decoder accepts the stream") {
    val w = 32; val h = 24 // 4x3 = 12 MCUs at 4:4:4
    val img = gradient(w, h)
    val withRst = JpegCodec.encode(w, h, img, quality = 90, restartInterval = 2)
    val plain = JpegCodec.encode(w, h, img, quality = 90)
    assert(withRst.length > plain.length, "DRI/RSTn bytes must be present")
    // our decoder: the restart path (byte-align, RSTn consume, DC reset)
    // must reproduce EXACTLY the same pixels as the marker-free stream
    val (_, _, a) = JpegCodec.decode(withRst)
    val (_, _, b) = JpegCodec.decode(plain)
    assert(a.sameElements(b),
      "restart-marker decode must be pixel-identical to the plain decode")
    // third-party: the JDK decodes the restart-marker stream too
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(withRst))
    assert(bi != null && bi.getWidth == w && bi.getHeight == h,
      "ImageIO rejected the restart-marker bitstream")
    val theirs = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val px = bi.getRGB(x, y); val p = (y * w + x) * 3
      theirs(p) = ((px >> 16) & 0xff).toByte
      theirs(p + 1) = ((px >> 8) & 0xff).toByte
      theirs(p + 2) = (px & 0xff).toByte
    }
    val (maxE, _) = errs(img, theirs)
    assert(maxE <= 20, s"third-party decode of restart stream off: $maxE")
  }

  test("a LYING SOF2 marker on a baseline stream refuses loudly (its SOS " +
      "declares a full-band DC scan — illegal progressive); decode() " +
      "degrades to the stub") {
    val ok = JpegCodec.encode(16, 16, gradient(16, 16))
    // flip the SOF0 marker (FF C0) to SOF2 (FF C2): the stream routes to
    // the progressive decoder, whose scan-header validation must refuse
    // the baseline SOS (Ss=0 with Se=63) rather than misread the scan
    val prog = ok.clone()
    val sof = ok.indices.find(i =>
      (ok(i) & 0xff) == 0xff && i + 1 < ok.length && (ok(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decode(prog))
    assert(e.getMessage.contains("DC scan"), e.getMessage)
    val rec = MediaRecord(5L, "image", prog, prog.length.toLong)
    assert(MediaCodec.decode(rec).feature.toSeq ==
      MediaCodec.decodeStub(rec).feature.toSeq,
      "malformed JPEG variants must degrade to the stub, not crash")
  }

  test("PROGRESSIVE encode (spectral-selection scan script) decodes " +
      "PIXEL-IDENTICAL to the baseline encoding — same coefficients, " +
      "different scan order") {
    for ((w, h) <- Seq((8, 8), (17, 9), (40, 24), (1, 1), (3, 21))) {
      val img = gradient(w, h)
      val prog = JpegCodec.encode(w, h, img, quality = 90, progressive = true)
      val base = JpegCodec.encode(w, h, img, quality = 90)
      // the stream is genuinely progressive: SOF2 present, 4 SOS markers
      assert(prog.indices.exists(i => (prog(i) & 0xff) == 0xff &&
        i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc2),
        s"no SOF2 in the progressive stream for ${w}x$h")
      val (dw, dh, a) = JpegCodec.decode(prog)
      val (_, _, b) = JpegCodec.decode(base)
      assert((dw, dh) == (w, h), s"dims for ${w}x$h")
      assert(a.sameElements(b),
        s"progressive reassembly diverged from sequential for ${w}x$h")
    }
  }

  test("THIRD-PARTY conformance: ImageIO decodes our PROGRESSIVE stream " +
      "to the same image") {
    val w = 32; val h = 16
    val img = gradient(w, h)
    val bytes = JpegCodec.encode(w, h, img, quality = 90, progressive = true)
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(bi != null, "ImageIO rejected our progressive JPEG bitstream")
    assert(bi.getWidth == w && bi.getHeight == h)
    val theirs = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val px = bi.getRGB(x, y)
      val p = (y * w + x) * 3
      theirs(p) = ((px >> 16) & 0xff).toByte
      theirs(p + 1) = ((px >> 8) & 0xff).toByte
      theirs(p + 2) = (px & 0xff).toByte
    }
    val (maxE, meanE) = errs(img, theirs)
    assert(maxE <= 20 && meanE <= 5.0,
      s"third-party decode of our progressive stream diverges: max=$maxE mean=$meanE")
  }

  test("THIRD-PARTY conformance: we decode an ImageIO-written PROGRESSIVE " +
      "JPEG (the IJG multi-scan script with successive approximation + " +
      "4:2:0 subsampling)") {
    val w = 33; val h = 17 // ragged on purpose
    val img = gradient(w, h)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      bi.setRGB(x, y, ((img(p) & 0xff) << 16) |
        ((img(p + 1) & 0xff) << 8) | (img(p + 2) & 0xff))
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val bytes = buf.toByteArray
    assert(bytes.indices.exists(i => (bytes(i) & 0xff) == 0xff &&
      i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xc2),
      "JDK writer did not produce a progressive JPEG — fixture assumption broken")
    val (dw, dh, out) = JpegCodec.decode(bytes)
    assert((dw, dh) == (w, h))
    val (maxE, meanE) = errs(img, out)
    // chroma subsampling costs more than 4:4:4 — still clearly the image
    assert(maxE <= 48 && meanE <= 8.0,
      s"JDK progressive decode diverges: max=$maxE mean=$meanE")
    // tighter: against ImageIO's OWN decode of the same bytes (identical
    // coefficients — differences are IDCT rounding + chroma upsampling)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val theirs = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val px = ref.getRGB(x, y); val p = (y * w + x) * 3
      theirs(p) = ((px >> 16) & 0xff).toByte
      theirs(p + 1) = ((px >> 8) & 0xff).toByte
      theirs(p + 2) = (px & 0xff).toByte
    }
    val (maxE2, meanE2) = errs(theirs, out)
    assert(maxE2 <= 40 && meanE2 <= 4.0,
      s"our progressive decode diverges from ImageIO's: max=$maxE2 mean=$meanE2")
  }

  test("PROGRESSIVE grayscale (single-component non-interleaved scans " +
      "with successive approximation) decodes from ImageIO bytes") {
    val w = 19; val h = 13
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = 30 + x * 9 + y * 3
      bi.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val bytes = buf.toByteArray
    assert(bytes.indices.exists(i => (bytes(i) & 0xff) == 0xff &&
      i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xc2),
      "JDK writer did not produce a progressive grayscale JPEG")
    val (dw, dh, out) = JpegCodec.decode(bytes)
    assert((dw, dh) == (w, h))
    for (p <- 0 until w * h)
      assert(out(p * 3) == out(p * 3 + 1) && out(p * 3) == out(p * 3 + 2),
        "grayscale must replicate to (g,g,g)")
    // values track the source within quantization error
    val ref = bi.getRaster
    var maxE = 0
    for (y <- 0 until h; x <- 0 until w) {
      val e = math.abs(ref.getSample(x, y, 0) - (out((y * w + x) * 3) & 0xff))
      if (e > maxE) maxE = e
    }
    assert(maxE <= 20, s"progressive grayscale reconstruction off by $maxE")
  }

  test("progressive scans ship per-scan OPTIMIZED huffman tables and true " +
      "EOB-run symbols; sparse images round-trip through the EOBRUN path") {
    // an almost-flat image: most chroma (and many luma) blocks carry zero
    // AC, so the per-component AC scans accumulate multi-block EOB runs —
    // with optimized tables these flush as EOBn (n >= 1) symbols, which
    // the fixed Annex K tables cannot even express
    val w = 64; val h = 64
    val img = Array.fill(w * h * 3)(120.toByte)
    img(0) = 200.toByte; img(1) = 40.toByte // one busy corner block
    val prog = JpegCodec.encode(w, h, img, quality = 85, progressive = true)
    val base = JpegCodec.encode(w, h, img, quality = 85)
    // four scans, each with its own DHT segment (mid-stream redefinition)
    def countMarker(bytes: Array[Byte], m: Int): Int = bytes.indices.count(i =>
      (bytes(i) & 0xff) == 0xff && i + 1 < bytes.length && (bytes(i + 1) & 0xff) == m)
    assert(countMarker(prog, 0xda) == 4, "expected 4 SOS markers")
    assert(countMarker(prog, 0xc4) == 4, "expected a DHT per scan")
    assert(countMarker(base, 0xc4) == 4, "baseline ships the 4 Annex K tables")
    // EOB runs + optimized tables: the sparse progressive stream must be
    // much smaller than the baseline one (every all-zero block there costs
    // three 4-bit EOB codes; here whole runs collapse to one EOBn symbol)
    assert(prog.length < base.length,
      s"optimized progressive (${prog.length} B) not smaller than baseline (${base.length} B)")
    // and it still decodes pixel-identical to the sequential stream
    val (_, _, a) = JpegCodec.decode(prog)
    val (_, _, b) = JpegCodec.decode(base)
    assert(a.sameElements(b), "EOBRUN reassembly diverged from sequential")
    // third-party: ImageIO agrees on the optimized-table stream
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(prog))
    assert(bi != null && bi.getWidth == w && bi.getHeight == h,
      "ImageIO rejected the optimized progressive stream")
  }

  test("optimalTable (Annex K.2): valid canonical tables from arbitrary " +
      "frequency profiles — Kraft-complete-or-under, 16-bit limited") {
    val profiles = Seq[Array[Long]](
      Array.tabulate(256)(i => if (i == 7) 1000L else 0L), // single symbol
      Array.tabulate(256)(i => if (i < 2) 50L else 0L), // two symbols
      Array.tabulate(256)(_ => 1L), // uniform — deep tree
      Array.tabulate(256)(i => (1L << (i % 30))), // wildly skewed
      Array.tabulate(256)(i => if (i % 3 == 0) i.toLong * i + 1 else 0L))
    for ((freq, pi) <- profiles.zipWithIndex) {
      val (bits, vals) = JpegCodec.optimalTable(freq)
      val nSyms = freq.count(_ > 0)
      assert(vals.length == nSyms, s"profile $pi: ${vals.length} vs $nSyms symbols")
      assert((1 to 16).map(bits).sum == nSyms, s"profile $pi: BITS sum mismatch")
      // Kraft inequality STRICT (< 1): the reserved all-ones code was
      // removed, so a decoder can always detect corruption
      val kraft = (1 to 16).map(l => bits(l) * math.pow(2, -l)).sum
      assert(kraft < 1.0 + 1e-12, s"profile $pi: Kraft sum $kraft")
      // every value is a real symbol, no duplicates
      assert(vals.toSet.size == vals.length && vals.forall(v => freq(v) > 0),
        s"profile $pi: bad value list")
    }
  }

  test("12-BIT precision (SOF1 extended sequential): round-trips within " +
      "a TIGHTER error budget than 8-bit, ships counted optimal tables") {
    for ((w, h) <- Seq((16, 16), (17, 9), (40, 24))) {
      val img = gradient(w, h)
      val bytes = JpegCodec.encode(w, h, img, quality = 90, precision = 12)
      // SOF1 with precision byte 12 (no JFIF APP0 — it is 8-bit-only, so
      // SOF1 follows SOI + DQT directly)
      val sof = bytes.indices.find(i => (bytes(i) & 0xff) == 0xff &&
        i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xc1).get
      assert((bytes(sof + 4) & 0xff) == 12, "SOF1 precision byte")
      val (dw, dh, out) = JpegCodec.decode(bytes)
      assert((dw, dh) == (w, h), s"dims for ${w}x$h")
      val (maxE, meanE) = errs(img, out)
      // same quant tables act on 16x-amplified samples, so relative
      // quantization error shrinks ~16x: demand clearly better than the
      // 8-bit budget (max <= 20, mean <= 5)
      assert(maxE <= 6 && meanE <= 1.5,
        s"12-bit ${w}x$h error too high: max=$maxE mean=$meanE")
      val (maxE8, _) = errs(img,
        JpegCodec.decode(JpegCodec.encode(w, h, img, quality = 90))._3)
      assert(maxE <= maxE8,
        s"12-bit (max $maxE) must not be worse than 8-bit (max $maxE8)")
    }
    // restart markers work in 12-bit mode too (block-indexed intervals)
    val img = gradient(32, 24)
    val rst = JpegCodec.encode(32, 24, img, quality = 90,
      restartInterval = 2, precision = 12)
    val plain = JpegCodec.encode(32, 24, img, quality = 90, precision = 12)
    val (_, _, a) = JpegCodec.decode(rst)
    val (_, _, b) = JpegCodec.decode(plain)
    assert(a.sameElements(b),
      "12-bit restart-marker decode must match the marker-free stream")
    // 16-bit quantization-table entries (DQT pq=1, the 12-bit-profile
    // form): widen every DQT segment in place — decode must be identical
    def widenDqt(bytes: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(bytes, 0, 2)
      var i = 2
      var headers = true
      while (headers && i + 1 < bytes.length) {
        if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xdb) {
          val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          assert(len == 67, "fixture DQT must hold one 8-bit table")
          o.write(0xff); o.write(0xdb)
          o.write(0); o.write(2 + 1 + 128)
          o.write(0x10 | (bytes(i + 4) & 0x0f))
          for (k <- 0 until 64) { o.write(0); o.write(bytes(i + 5 + k) & 0xff) }
          i += 2 + len
        } else if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xda) {
          o.write(bytes, i, bytes.length - i); headers = false
        } else { o.write(bytes(i) & 0xff); i += 1 }
      }
      o.toByteArray
    }
    val (_, _, c16) = JpegCodec.decode(widenDqt(plain))
    assert(c16.sameElements(b), "pq=1 16-bit DQT entries must decode identically")
    // and a pq nibble of 2 is malformed — refuse loudly
    val badPq = plain.clone()
    val dqt = badPq.indices.find(i => (badPq(i) & 0xff) == 0xff &&
      i + 1 < badPq.length && (badPq(i + 1) & 0xff) == 0xdb).get
    badPq(dqt + 4) = 0x20.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decode(badPq))
    assert(e.getMessage.contains("quantization precision"), e.getMessage)
  }

  test("decode() sniffs JPEG by magic and reports real dimensions") {
    val img = gradient(24, 8)
    val f = MediaCodec.decode(MediaRecord(6L, "image",
      JpegCodec.encode(24, 8, img), 1L))
    assert((f.width, f.height, f.n_frames) == (24, 8, 1))
  }
}
