package graft.operators

/** Pure-JVM JPEG codec — zero codec libraries, just the public ITU-T
  * T.81 spec: the encoder writes baseline sequential JFIF (SOF0, 4:4:4,
  * the spec's Annex K quantization + Huffman tables) or a PROGRESSIVE
  * (SOF2) spectral-selection scan script, and the decoder reads
  * baseline/extended-sequential Huffman JPEG (grayscale or YCbCr, any
  * sampling factors up to 4 incl. 4:2:0/4:2:2, restart markers, byte
  * stuffing) AND progressive JPEG (spectral selection + successive
  * approximation, EOB runs, per-scan restart markers — T.81 annex G),
  * at 8-bit or 12-bit sample precision (12-bit encoding ships counted
  * optimal tables, since Annex K stops at DC category 11 / AC size 10).
  * Arithmetic coding refuses loudly —
  * [[Multimodal.MediaCodec.decode]] then degrades to the stub so mixed
  * corpora keep flowing.
  *
  * JPEG is LOSSY, so unlike the BMP/PPM/PNG codecs a round trip is
  * near-identity, not identity: the contract query pins exact dimensions
  * plus BOUNDED reconstruction error (the established bounded-error
  * oracle pattern), and the spec checks tolerance on smooth images where
  * DCT quantization error is small and well-understood.
  */
object JpegCodec {

  // ------------------------------------------------------- spec constants

  /** Zigzag order: zz(i) = natural position of the i-th zigzag index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (quality-50 reference). */
  private val StdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table. */
  private val StdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 typical Huffman tables: (bits per code length 1..16, values)
  // default arithmetic-conditioning parameters (T.81 F.1.4.4.1.4/F.1.4.4.2:
  // DC thresholds L=0, U=1; AC high-frequency section boundary Kx=5) —
  // written into the DAC segment and replayed by the decoder
  private val ArithDcL = 0
  private val ArithDcU = 1
  private val ArithAcKx = 5

  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // ------------------------------------------------------------- encoder

  /** Quality-scaled quantization table (libjpeg's public scaling rule). */
  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - q * 2
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >>> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1-bits per spec
      val pad = 8 - nBits
      put((1 << pad) - 1, pad)
    }
  }

  /** Optimal length-limited Huffman table from symbol frequencies — the
    * T.81 Annex K.2 procedure: code sizes by repeated pair-merging of the
    * two least-frequent entries (ties to the LARGER value, per the spec's
    * flowchart), with symbol 256 reserved at frequency 1 so no real symbol
    * gets the all-ones codeword; then the BITS list is limited to 16 via
    * the spec's adjustment and the reserved codeword removed. Returns
    * `(bits[17], values)` in canonical (length-asc, value-asc) order —
    * exactly what a DHT segment carries. */
  private[operators] def optimalTable(freqIn: Array[Long]): (Array[Int], Array[Int]) = {
    require(freqIn.length == 256, s"need 256 symbol frequencies, got ${freqIn.length}")
    val freq = java.util.Arrays.copyOf(freqIn, 257)
    freq(256) = 1
    val codesize = new Array[Int](257)
    val others = Array.fill(257)(-1)
    def findLeast(exclude: Int): Int = {
      var best = -1; var bf = Long.MaxValue
      var i = 0
      while (i < 257) {
        if (i != exclude && freq(i) > 0 && freq(i) <= bf) { best = i; bf = freq(i) }
        i += 1
      }
      best
    }
    var merging = true
    while (merging) {
      var v1 = findLeast(-1)
      var v2 = findLeast(v1)
      if (v2 < 0) merging = false
      else {
        freq(v1) += freq(v2); freq(v2) = 0
        codesize(v1) += 1
        while (others(v1) != -1) { v1 = others(v1); codesize(v1) += 1 }
        others(v1) = v2
        codesize(v2) += 1
        while (others(v2) != -1) { v2 = others(v2); codesize(v2) += 1 }
      }
    }
    // raw depths can exceed 32 on adversarial (Fibonacci-skewed) frequency
    // profiles — up to 256 with 257 leaves — so count at full depth and
    // let the spec's adjustment walk everything down to 16
    val bits = new Array[Int](258)
    var i = 0
    while (i < 257) {
      if (codesize(i) > 0) bits(codesize(i)) += 1
      i += 1
    }
    // limit to 16 bits: move a pair of leaves from the longest level under
    // an interior node freed one level up (the spec's adjust procedure)
    var ii = 257
    while (ii > 16) {
      if (bits(ii) > 0) {
        var j = ii - 2
        while (bits(j) == 0) j -= 1
        bits(ii) -= 2
        bits(ii - 1) += 1
        bits(j + 1) += 2
        bits(j) -= 1
      } else ii -= 1
    }
    // remove the reserved all-ones codeword from the longest used level
    var k = 16
    while (k > 0 && bits(k) == 0) k -= 1
    if (k > 0) bits(k) -= 1
    // canonical value list: real symbols by (final code size asc, value asc)
    val order = (0 until 256).filter(codesize(_) > 0)
      .sortBy(s => (codesize(s), s)).toArray
    (java.util.Arrays.copyOf(bits, 17), order)
  }

  /** (code, length) per symbol from a (bits, values) table description. */
  private def encodingTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    table
  }

  private def magnitudeCategory(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** cos((2x+1)·u·π/16) — shared by both DCT directions. */
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val C0 = 1 / math.sqrt(2)

  /** Forward 8x8 DCT-II with orthonormal scaling, separable (rows then
    * columns) over the precomputed cosine table. */
  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) { // 1-D over columns of each row
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += block(x * 8 + y) * Cos(y)(v); y += 1 }
        tmp(x * 8 + v) = s
        v += 1
      }
      x += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) { // 1-D over rows
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x2 = 0
        while (x2 < 8) { s += tmp(x2 * 8 + v) * Cos(x2)(u); x2 += 1 }
        val cu = if (u == 0) C0 else 1.0
        val cv = if (v == 0) C0 else 1.0
        out(u * 8 + v) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 8x8 DCT, separable, matching [[fdct]]'s scaling. */
  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // 1-D inverse over v for each u row
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) C0 else 1.0
          s += cv * coef(u * 8 + v) * Cos(y)(v)
          v += 1
        }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u2 = 0
        while (u2 < 8) {
          val cu = if (u2 == 0) C0 else 1.0
          s += cu * tmp(u2 * 8 + y) * Cos(x)(u2)
          u2 += 1
        }
        out(x * 8 + y) = 0.25 * s
        y += 1
      }
      x += 1
    }
    out
  }

  /** Encode RGB (row-major top-down, 3 bytes/pixel) as baseline JFIF,
    * 4:4:4 (no chroma subsampling), Annex K tables scaled by `quality`.
    * `restartInterval > 0` writes a DRI segment and emits RSTn markers
    * every that-many MCUs (DC predictors reset, bitstream byte-aligned) —
    * the form camera firmware writes for error resilience, and the test
    * vector for the decoder's restart path. */
  def encode(w: Int, h: Int, rgb: Array[Byte], quality: Int = 85,
      restartInterval: Int = 0, progressive: Boolean = false,
      precision: Int = 8, arithmetic: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"need ${w * h * 3} RGB bytes for ${w}x$h, got ${rgb.length}")
    require(restartInterval >= 0, "restart interval cannot be negative")
    require(!progressive || restartInterval == 0,
      "restart intervals unsupported in progressive mode")
    require(precision == 8 || precision == 12,
      s"T.81 sample precision is 8 or 12, got $precision")
    require(precision == 8 || !progressive,
      "12-bit precision is sequential-only in this encoder")
    require(!arithmetic || restartInterval == 0,
      "restart intervals unsupported with arithmetic coding")
    require(!arithmetic || precision == 8 || !progressive,
      "arithmetic progressive is 8-bit here")
    val lumaQ = scaledQ(StdLumaQ, quality)
    val chromaQ = scaledQ(StdChromaQ, quality)
    // 12-bit samples are the 8-bit input widened x16 (0..4080), so the
    // level-shifted plane value is just the centered 8-bit value x16; DC
    // magnitudes then reach category 15 and AC category 14, which the
    // fixed Annex K tables cannot code — 12-bit encoding always runs the
    // two-pass optimal-table path
    val pscale = 1 << (precision - 8)

    // RGB -> YCbCr planes, edge-replicated to 8-multiples
    val pw = (w + 7) / 8 * 8; val ph = (h + 7) / 8 * 8
    val yP = new Array[Double](pw * ph)
    val cbP = new Array[Double](pw * ph)
    val crP = new Array[Double](pw * ph)
    var yy = 0
    while (yy < ph) {
      val sy = math.min(yy, h - 1)
      var xx = 0
      while (xx < pw) {
        val sx = math.min(xx, w - 1)
        val p = (sy * w + sx) * 3
        val r = rgb(p) & 0xff; val g = rgb(p + 1) & 0xff; val b = rgb(p + 2) & 0xff
        val o = yy * pw + xx
        yP(o) = (0.299 * r + 0.587 * g + 0.114 * b - 128) * pscale
        cbP(o) = (-0.168736 * r - 0.331264 * g + 0.5 * b) * pscale
        crP(o) = (0.5 * r - 0.418688 * g - 0.081312 * b) * pscale
        xx += 1
      }
      yy += 1
    }

    var payload = new java.io.ByteArrayOutputStream(rgb.length / 4 + 1024)
    var bw = new BitWriter(payload)
    val dcL = encodingTable(DcLumaBits, DcLumaVals)
    val acL = encodingTable(AcLumaBits, AcLumaVals)
    val dcC = encodingTable(DcChromaBits, DcChromaVals)
    val acC = encodingTable(AcChromaBits, AcChromaVals)
    val pred = new Array[Int](3)

    def quantizeBlock(plane: Array[Double], bx: Int, by: Int,
        q: Array[Int]): Array[Int] = {
      val blk = new Array[Double](64)
      var i = 0
      while (i < 64) {
        blk(i) = plane((by * 8 + i / 8) * pw + bx * 8 + i % 8); i += 1
      }
      val f = fdct(blk)
      val zz = new Array[Int](64)
      i = 0
      while (i < 64) {
        val nat = Zigzag(i)
        zz(i) = math.round(f(nat) / q(nat)).toInt
        // AC magnitudes top out at 10 bits (8-bit precision) / 14 bits
        // (12-bit); only reachable at quality ~100 where a quant step
        // hits 1 — clamp, don't corrupt
        val acClamp = if (precision == 8) 1023 else 16383
        if (i > 0) zz(i) = math.max(-acClamp, math.min(acClamp, zz(i)))
        i += 1
      }
      zz
    }

    def emitDc(zz0: Int, dcT: Array[(Int, Int)], comp: Int): Unit = {
      val diff = zz0 - pred(comp)
      pred(comp) = zz0
      val cat = magnitudeCategory(diff)
      val (dcCode, dcLen) = dcT(cat)
      bw.put(dcCode, dcLen)
      if (cat > 0)
        bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
    }

    def emitAc(zz: Array[Int], acT: Array[(Int, Int)]): Unit = {
      var run = 0
      var i = 1
      while (i < 64) {
        if (zz(i) == 0) run += 1
        else {
          while (run > 15) { val (c, l) = acT(0xf0); bw.put(c, l); run -= 16 }
          val sz = magnitudeCategory(zz(i))
          val (c, l) = acT((run << 4) | sz)
          bw.put(c, l)
          bw.put(if (zz(i) < 0) zz(i) + (1 << sz) - 1 else zz(i), sz)
          run = 0
        }
        i += 1
      }
      if (run > 0) { val (c, l) = acT(0x00); bw.put(c, l) }
    }

    def encodeBlock(plane: Array[Double], bx: Int, by: Int, q: Array[Int],
        dcT: Array[(Int, Int)], acT: Array[(Int, Int)], comp: Int): Unit = {
      val zz = quantizeBlock(plane, bx, by, q)
      emitDc(zz(0), dcT, comp)
      emitAc(zz, acT)
    }

    // scan script: (pre-SOS marker bytes e.g. per-scan DHT, SOS
    // payload-header bytes, entropy payload) per scan — ONE full-band scan
    // for baseline, DC-then-per-component-AC for the progressive
    // spectral-selection script
    val scans = scala.collection.mutable.ArrayBuffer
      .empty[(Array[Byte], Array[Byte], java.io.ByteArrayOutputStream)]
    def startScan(): Unit = {
      payload = new java.io.ByteArrayOutputStream(rgb.length / 8 + 256)
      bw = new BitWriter(payload)
      java.util.Arrays.fill(pred, 0)
    }
    // a symbol sink abstracts count-vs-write so two-pass (optimal-table)
    // modes share one deterministic symbol walk with the writing pass
    abstract class Sink { def sym(s: Int): Unit; def raw(v: Int, n: Int): Unit }
    final class Counter(val freq: Array[Long] = new Array[Long](256)) extends Sink {
      def sym(s: Int): Unit = freq(s) += 1
      def raw(v: Int, n: Int): Unit = ()
    }
    final class Writer(enc: Array[(Int, Int)]) extends Sink {
      def sym(s: Int): Unit = {
        val e = enc(s)
        require(e != null, f"symbol 0x$s%02x missing from scan table")
        bw.put(e._1, e._2)
      }
      def raw(v: Int, n: Int): Unit = if (n > 0) bw.put(v, n)
    }
    def emitDcSym(zz0: Int, comp: Int, sink: Sink): Unit = {
      val diff = zz0 - pred(comp)
      pred(comp) = zz0
      val cat = magnitudeCategory(diff)
      sink.sym(cat)
      if (cat > 0) sink.raw(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
    }
    def emitAcSyms(zz: Array[Int], sink: Sink): Unit = {
      var run = 0
      var i = 1
      while (i < 64) {
        if (zz(i) == 0) run += 1
        else {
          while (run > 15) { sink.sym(0xf0); run -= 16 }
          val sz = magnitudeCategory(zz(i))
          sink.sym((run << 4) | sz)
          sink.raw(if (zz(i) < 0) zz(i) + (1 << sz) - 1 else zz(i), sz)
          run = 0
        }
        i += 1
      }
      if (run > 0) sink.sym(0x00)
    }
    // 12-bit sequential tables, built by its counting pass (the fixed
    // Annex K tables stop at DC category 11 / AC size 10 — 12-bit diffs
    // reach 15/14, so this mode ALWAYS ships optimized tables)
    var seqTables: Option[(
      (Array[Int], Array[Int]), (Array[Int], Array[Int]),
      (Array[Int], Array[Int]), (Array[Int], Array[Int]))] = None
    if (arithmetic) {
      // ARITHMETIC scans (SOF9 sequential / SOF10 progressive): the same
      // quantized coefficients as the huffman paths, entropy-coded through
      // the Annex D coder with the Annex F/G statistics models. Default
      // conditioning (DC L=0 U=1; AC Kx=5), no DHT segments; each scan is
      // an independent entropy segment with FRESH statistics. The
      // progressive script uses SUCCESSIVE APPROXIMATION (Al=1 first
      // scans, Al=0 refinements), so a round-trip exercises all four
      // arithmetic scan types while reassembling the exact coefficients.
      val nbx = pw / 8; val nby = ph / 8
      val planesArr = Array(yP, cbP, crP)
      val qsArr = Array(lumaQ, chromaQ, chromaQ)
      val coefs = Array.tabulate(3, nby * nbx) { (c, bi) =>
        quantizeBlock(planesArr(c), bi % nbx, bi / nbx, qsArr(c))
      }
      var enc: JpegArith.Encoder = null
      var dcStats: Array[Array[Int]] = null
      var acStats: Array[Array[Int]] = null
      var fixedBin: Array[Int] = null
      val dcContext = new Array[Int](3)
      def freshScan(): Unit = {
        startScan()
        enc = new JpegArith.Encoder
        dcStats = Array.fill(2)(JpegArith.freshBins(64))
        acStats = Array.fill(2)(JpegArith.freshBins(256))
        fixedBin = Array(JpegArith.FixedBin << 1)
        java.util.Arrays.fill(dcContext, 0)
      }
      def endScan(sosBody: Array[Byte]): Unit = {
        payload.write(enc.finish())
        scans += ((Array.emptyByteArray, sosBody, payload))
      }

      // F.1.4.1: DC difference of the point-transformed value — zero/sign/
      // small decisions conditioned on the PREVIOUS block's difference
      // class, magnitude category chain at bins 20+, magnitude bits 14
      // above the stopping category bin
      def encodeDcArith(comp: Int, tbl: Int, v: Int): Unit = {
        val stats = dcStats(tbl)
        val base = dcContext(comp)
        val diff = v - pred(comp); pred(comp) = v
        if (diff == 0) { enc.encode(stats, base, 0); dcContext(comp) = 0 }
        else {
          enc.encode(stats, base, 1)
          val sign = if (diff < 0) 1 else 0
          enc.encode(stats, base + 1, sign)
          val sz = math.abs(diff) - 1
          var m = 0
          if (sz == 0) enc.encode(stats, base + 2 + sign, 0)
          else {
            enc.encode(stats, base + 2 + sign, 1)
            m = 1
            var st = 20
            while (sz >= (m << 1)) { enc.encode(stats, st, 1); m <<= 1; st += 1 }
            enc.encode(stats, st, 0)
            var mm = m >> 1
            while (mm != 0) {
              enc.encode(stats, st + 14, if ((sz & mm) != 0) 1 else 0)
              mm >>= 1
            }
          }
          // F.1.4.4.1.2 conditioning class for the NEXT block (L=0, U=1):
          // |diff| in {1..3} is "small", >= 4 "large", signed
          dcContext(comp) =
            if (m < ((1 << ArithDcL) >> 1)) 0
            else if (m > ((1 << ArithDcU) >> 1)) 12 + sign * 4
            else 4 + sign * 4
        }
      }

      /** Signed point transform (G.1.2.1/2): sign(v)·(|v| >> al). */
      def pt(v: Int, al: Int): Int =
        if (v < 0) -((-v) >> al) else v >> al

      // F.1.4.2 (+ G first scans): per-position EOB/zero-run/value
      // decisions at bins 3(k-1)..3(k-1)+2, sign through the fixed bin,
      // category chains in the low-k/high-k shared sections at 189/217
      def encodeAcFirst(tbl: Int, zz: Array[Int], ss: Int, se: Int,
          al: Int): Unit = {
        val stats = acStats(tbl)
        var kLast = se
        while (kLast >= ss && pt(zz(kLast), al) == 0) kLast -= 1
        var k = ss
        while (k <= kLast) {
          var st = 3 * (k - 1)
          enc.encode(stats, st, 0) // not end-of-block
          while (pt(zz(k), al) == 0) { enc.encode(stats, st + 1, 0); st += 3; k += 1 }
          enc.encode(stats, st + 1, 1)
          val v0 = pt(zz(k), al)
          val sign = if (v0 < 0) 1 else 0
          enc.encode(fixedBin, 0, sign)
          val sz = math.abs(v0) - 1
          if (sz == 0) enc.encode(stats, st + 2, 0)
          else {
            enc.encode(stats, st + 2, 1)
            if (sz == 1) enc.encode(stats, st + 2, 0) // category 1, no bits
            else {
              enc.encode(stats, st + 2, 1)
              var m = 2
              var xst = if (k <= ArithAcKx) 189 else 217
              while (sz >= (m << 1)) { enc.encode(stats, xst, 1); m <<= 1; xst += 1 }
              enc.encode(stats, xst, 0)
              var mm = m >> 1
              while (mm != 0) {
                enc.encode(stats, xst + 14, if ((sz & mm) != 0) 1 else 0)
                mm >>= 1
              }
            }
          }
          k += 1
        }
        if (kLast < se) enc.encode(stats, 3 * (math.max(kLast + 1, ss) - 1), 1)
      }

      // G.1.3.3 AC refinement: correction bit per nonzero-HISTORY
      // coefficient, presence+sign for the newly nonzero, EOB decisions
      // only past the previous scan's highest nonzero (kex) — mirrors the
      // decoder's walk decision for decision
      def encodeAcRefine(tbl: Int, zz: Array[Int], ss: Int, se: Int,
          al: Int): Unit = {
        val stats = acStats(tbl)
        var kex = se
        while (kex > 0 && pt(zz(kex), al + 1) == 0) kex -= 1
        var kLastNew = se
        while (kLastNew >= ss && !(pt(zz(kLastNew), al + 1) == 0 &&
            pt(zz(kLastNew), al) != 0)) kLastNew -= 1
        var k = ss
        var done = false
        while (k <= se && !done) {
          var st = 3 * (k - 1)
          if (k > kex) {
            if (k > kLastNew) { enc.encode(stats, st, 1); done = true } // EOB
            else enc.encode(stats, st, 0)
          }
          if (!done) {
            var placed = false
            while (!placed) {
              val hist = pt(zz(k), al + 1)
              val cur = pt(zz(k), al)
              if (hist != 0) {
                enc.encode(stats, st + 2, math.abs(cur) & 1)
                placed = true
              } else if (cur != 0) { // newly nonzero: always ±1 here
                enc.encode(stats, st + 1, 1)
                enc.encode(fixedBin, 0, if (cur < 0) 1 else 0)
                placed = true
              } else {
                enc.encode(stats, st + 1, 0)
                st += 3; k += 1
                require(k <= se, "refinement walked past the band")
              }
            }
            k += 1
          }
        }
      }

      if (!progressive) {
        freshScan()
        var bi = 0
        while (bi < nby * nbx) {
          var comp = 0
          while (comp < 3) {
            val zz = coefs(comp)(bi)
            val tbl = if (comp == 0) 0 else 1
            encodeDcArith(comp, tbl, zz(0))
            encodeAcFirst(tbl, zz, 1, 63, 0)
            comp += 1
          }
          bi += 1
        }
        endScan(Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
      } else {
        // scan 1: interleaved DC first at Al=1 — the DC point transform is
        // an ARITHMETIC shift (G.1.2.1; AC uses sign-magnitude, G.1.2.2),
        // so the refinement's two's-complement bit-OR reassembles exactly
        freshScan()
        var bi = 0
        while (bi < nby * nbx) {
          var comp = 0
          while (comp < 3) {
            encodeDcArith(comp, if (comp == 0) 0 else 1, coefs(comp)(bi)(0) >> 1)
            comp += 1
          }
          bi += 1
        }
        endScan(Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x01))
        // scan 2: interleaved DC refinement (bit 0 through the fixed bin)
        freshScan()
        bi = 0
        while (bi < nby * nbx) {
          var comp = 0
          while (comp < 3) {
            enc.encode(fixedBin, 0, coefs(comp)(bi)(0) & 1)
            comp += 1
          }
          bi += 1
        }
        endScan(Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x10))
        // scans 3..8: per component, AC first at Al=1 then AC refinement
        var c = 0
        while (c < 3) {
          val tbl = if (c == 0) 0 else 1
          freshScan()
          bi = 0
          while (bi < nby * nbx) {
            encodeAcFirst(tbl, coefs(c)(bi), 1, 63, 1); bi += 1
          }
          endScan(Array[Byte](1, (c + 1).toByte, ((tbl << 4) | tbl).toByte,
            1, 63, 0x01))
          freshScan()
          bi = 0
          while (bi < nby * nbx) {
            encodeAcRefine(tbl, coefs(c)(bi), 1, 63, 0); bi += 1
          }
          endScan(Array[Byte](1, (c + 1).toByte, ((tbl << 4) | tbl).toByte,
            1, 63, 0x10))
          c += 1
        }
      }
    } else if (!progressive && precision == 8) {
      var mcu = 0
      var by = 0
      while (by < ph / 8) {
        var bx = 0
        while (bx < pw / 8) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            // byte-align (1-padded), emit RST(n mod 8), reset DC predictors
            bw.flush()
            payload.write(0xff)
            payload.write(0xd0 + (mcu / restartInterval - 1) % 8)
            java.util.Arrays.fill(pred, 0)
          }
          encodeBlock(yP, bx, by, lumaQ, dcL, acL, 0)
          encodeBlock(cbP, bx, by, chromaQ, dcC, acC, 1)
          encodeBlock(crP, bx, by, chromaQ, dcC, acC, 2)
          mcu += 1
          bx += 1
        }
        by += 1
      }
      bw.flush()
      scans += ((Array.emptyByteArray,
        Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0), payload))
    } else if (!progressive) {
      // 12-bit extended sequential: one interleaved scan, coded twice
      // (count -> optimal tables -> write) through the shared symbol walk
      val nbx = pw / 8; val nby = ph / 8
      val planesArr = Array(yP, cbP, crP)
      val qsArr = Array(lumaQ, chromaQ, chromaQ)
      val coefs = Array.tabulate(3, nby * nbx) { (c, bi) =>
        quantizeBlock(planesArr(c), bi % nbx, bi / nbx, qsArr(c))
      }
      def seqPass(dL: Sink, aL: Sink, dC: Sink, aC: Sink,
          onRestart: Int => Unit): Unit = {
        java.util.Arrays.fill(pred, 0)
        var bi = 0
        while (bi < nby * nbx) {
          if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
            onRestart(bi)
            java.util.Arrays.fill(pred, 0)
          }
          emitDcSym(coefs(0)(bi)(0), 0, dL); emitAcSyms(coefs(0)(bi), aL)
          emitDcSym(coefs(1)(bi)(0), 1, dC); emitAcSyms(coefs(1)(bi), aC)
          emitDcSym(coefs(2)(bi)(0), 2, dC); emitAcSyms(coefs(2)(bi), aC)
          bi += 1
        }
      }
      val (cdL, caL, cdC, caC) = (new Counter(), new Counter(), new Counter(), new Counter())
      seqPass(cdL, caL, cdC, caC, _ => ())
      val tDcL = optimalTable(cdL.freq); val tAcL = optimalTable(caL.freq)
      val tDcC = optimalTable(cdC.freq); val tAcC = optimalTable(caC.freq)
      seqTables = Some((tDcL, tAcL, tDcC, tAcC))
      startScan()
      seqPass(
        new Writer(encodingTable(tDcL._1, tDcL._2)),
        new Writer(encodingTable(tAcL._1, tAcL._2)),
        new Writer(encodingTable(tDcC._1, tDcC._2)),
        new Writer(encodingTable(tAcC._1, tAcC._2)),
        bi => {
          bw.flush()
          payload.write(0xff)
          payload.write(0xd0 + (bi / restartInterval - 1) % 8)
        })
      bw.flush()
      scans += ((Array.emptyByteArray,
        Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0), payload))
    } else {
      // quantize every block once; the scans re-walk the coefficients.
      // Each scan is coded TWICE with the same deterministic symbol walk:
      // a counting pass feeds the Annex K.2 optimal-table builder, then a
      // writing pass emits against the per-scan tables (the IJG approach —
      // progressive entropy coding always ships optimized tables). Custom
      // tables make true EOB-RUN symbols (EOBn, n>=1) available, which the
      // fixed Annex K tables lack, and each scan carries its OWN DHT
      // segment — mid-stream table redefinition, like real encoders.
      val nbx = pw / 8; val nby = ph / 8
      val planesArr = Array(yP, cbP, crP)
      val qsArr = Array(lumaQ, chromaQ, chromaQ)
      val coefs = Array.tabulate(3, nby * nbx) { (c, bi) =>
        quantizeBlock(planesArr(c), bi % nbx, bi / nbx, qsArr(c))
      }
      def dhtSeg(entries: (Int, Int, Array[Int], Array[Int])*): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        o.write(0xff); o.write(0xc4)
        val len = 2 + entries.map(e => 1 + 16 + e._4.length).sum
        o.write(len >> 8); o.write(len & 0xff)
        entries.foreach { case (cls, id, bits, vals) =>
          o.write((cls << 4) | id)
          var i = 1
          while (i <= 16) { o.write(bits(i)); i += 1 }
          vals.foreach(o.write)
        }
        o.toByteArray
      }
      // scan 1: interleaved DC of all components (Ss=0 Se=0 Ah=0 Al=0)
      def dcPass(sinkL: Sink, sinkC: Sink): Unit = {
        java.util.Arrays.fill(pred, 0)
        var bi = 0
        while (bi < nby * nbx) {
          emitDcSym(coefs(0)(bi)(0), 0, sinkL)
          emitDcSym(coefs(1)(bi)(0), 1, sinkC)
          emitDcSym(coefs(2)(bi)(0), 2, sinkC)
          bi += 1
        }
      }
      val (cntL, cntC) = (new Counter(), new Counter())
      dcPass(cntL, cntC)
      val (dcLBits, dcLVals) = optimalTable(cntL.freq)
      val (dcCBits, dcCVals) = optimalTable(cntC.freq)
      startScan()
      dcPass(new Writer(encodingTable(dcLBits, dcLVals)),
        new Writer(encodingTable(dcCBits, dcCVals)))
      bw.flush()
      scans += ((dhtSeg((0, 0, dcLBits, dcLVals), (0, 1, dcCBits, dcCVals)),
        Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0), payload))
      // scans 2..4: each component's full AC band (Ss=1 Se=63), EOB runs
      // accumulated across all-zero-tail blocks and flushed as true EOBn
      var c = 0
      while (c < 3) {
        def acPass(sink: Sink): Unit = {
          var eobrun = 0
          def flushEob(): Unit = if (eobrun > 0) {
            var r = 0
            while ((2 << r) <= eobrun) r += 1 // r = floor(log2(eobrun))
            sink.sym(r << 4)
            sink.raw(eobrun - (1 << r), r)
            eobrun = 0
          }
          var b2 = 0
          while (b2 < nby * nbx) {
            val zz = coefs(c)(b2)
            var kLast = 63
            while (kLast >= 1 && zz(kLast) == 0) kLast -= 1
            if (kLast == 0) {
              eobrun += 1
              if (eobrun == 0x7fff) flushEob()
            } else {
              flushEob() // pending EOB run ends before this block's symbols
              var run = 0
              var k = 1
              while (k <= kLast) {
                if (zz(k) == 0) run += 1
                else {
                  while (run > 15) { sink.sym(0xf0); run -= 16 }
                  val sz = magnitudeCategory(zz(k))
                  sink.sym((run << 4) | sz)
                  sink.raw(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
                  run = 0
                }
                k += 1
              }
              if (kLast < 63) eobrun = 1 // this block's own EOB starts a run
            }
            b2 += 1
          }
          flushEob()
        }
        val cnt = new Counter()
        acPass(cnt)
        val (acBits, acVals) = optimalTable(cnt.freq)
        startScan()
        acPass(new Writer(encodingTable(acBits, acVals)))
        bw.flush()
        val acId = if (c == 0) 0 else 1
        scans += ((dhtSeg((1, acId, acBits, acVals)),
          Array[Byte](1, (c + 1).toByte, (acId & 0x0f).toByte, 1, 63, 0),
          payload))
        c += 1
      }
    }

    // ------------------------------------------------------------ headers
    val out = new java.io.ByteArrayOutputStream(payload.size + 1024)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    if (precision == 8) { // JFIF is defined for 8-bit samples only
      marker(0xe0); u16(16) // APP0 JFIF
      out.write("JFIF".getBytes); u8(0); u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    }
    def dqt(id: Int, q: Array[Int]): Unit = {
      marker(0xdb); u16(67); u8(id)
      var i = 0
      while (i < 64) { u8(q(Zigzag(i))); i += 1 }
    }
    dqt(0, lumaQ); dqt(1, chromaQ)
    // SOF0 (baseline), SOF1 (12-bit extended sequential), SOF2
    // (progressive), SOF9 (arithmetic sequential) or SOF10 (arithmetic
    // progressive) — identical layout, differing precision byte
    marker(if (arithmetic && progressive) 0xca
      else if (arithmetic) 0xc9
      else if (progressive) 0xc2
      else if (precision == 12) 0xc1 else 0xc0)
    u16(8 + 3 * 3); u8(precision); u16(h); u16(w); u8(3)
    u8(1); u8(0x11); u8(0) // Y: 1x1, q0
    u8(2); u8(0x11); u8(1) // Cb
    u8(3); u8(0x11); u8(1) // Cr
    if (arithmetic) {
      // DAC: conditioning for DC tables 0/1 ((U<<4)|L) and AC tables 0/1
      // (Kx) — the defaults, written explicitly so any decoder sees them
      marker(0xcc); u16(2 + 8)
      u8(0x00); u8((ArithDcU << 4) | ArithDcL)
      u8(0x01); u8((ArithDcU << 4) | ArithDcL)
      u8(0x10); u8(ArithAcKx)
      u8(0x11); u8(ArithAcKx)
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | id)
      var i = 1
      while (i <= 16) { u8(bits(i)); i += 1 }
      vals.foreach(u8)
    }
    // 8-bit baseline ships the Annex K defaults up front; 12-bit ships its
    // counted optimal tables (Annex K cannot code 12-bit categories);
    // progressive scans each carry their own DHT in the pre-SOS preamble
    seqTables match {
      case Some((tDcL, tAcL, tDcC, tAcC)) =>
        dht(0, 0, tDcL._1, tDcL._2); dht(1, 0, tAcL._1, tAcL._2)
        dht(0, 1, tDcC._1, tDcC._2); dht(1, 1, tAcC._1, tAcC._2)
      case None if !progressive && !arithmetic =>
        dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcLumaBits, AcLumaVals)
        dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcChromaBits, AcChromaVals)
      case None => () // progressive: per-scan DHT; arithmetic: DAC above
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    scans.foreach { case (preamble, sosBody, pay) =>
      preamble.foreach(v => u8(v & 0xff))
      marker(0xda); u16(2 + sosBody.length)
      sosBody.foreach(v => u8(v & 0xff))
      pay.writeTo(out)
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical: minCode/maxCode per length + value offset
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len); k += bits(len)
        maxCode(len) = code - 1
        if (bits(len) == 0) maxCode(len) = -1
        code <<= 1
      }
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var sawEoi = false
    /** Next entropy bit; handles 0xFF00 stuffing, stops at a marker. */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) { sawEoi = true; return 0 }
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val next = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (next == 0x00) pos += 1 // stuffed 0xFF data byte
          else { sawEoi = true; pos -= 1; b = 0 } // marker: stop, pad zeros
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an RSTn marker (restart-interval boundary).
      * T.81 numbers restart markers modulo 8 exactly so decoders can DETECT
      * a dropped or duplicated restart segment: consuming a marker whose
      * index does not match the expected `n mod 8` means the entropy stream
      * lost sync — decoding on would produce silently shifted blocks, so
      * refuse loudly instead. */
    def restart(expected: Int): Unit = {
      nBits = 0
      while (pos + 1 < data.length &&
          !((data(pos) & 0xff) == 0xff && (data(pos + 1) & 0xf8) == 0xd0))
        pos += 1
      require(pos + 1 < data.length,
        "corrupt JPEG: expected restart marker, hit end of stream")
      val got = data(pos + 1) & 0x07
      require(got == (expected & 7),
        s"corrupt JPEG: found RST$got where RST${expected & 7} was due — " +
          "a restart segment was dropped or duplicated")
      pos += 2
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16) {
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.values(t.valPtr(len) + code - t.minCode(len))
        code = (code << 1) | bit()
        len += 1
      }
      throw new IllegalArgumentException("corrupt JPEG: invalid Huffman code")
    }
  }

  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  /** Decode a baseline/extended-sequential/PROGRESSIVE Huffman JPEG or an
    * ARITHMETIC-coded JPEG — sequential (SOF9) AND progressive (SOF10,
    * all four Annex G scan types incl. successive approximation) — via
    * the Annex D coder + Annex F/G statistics with DAC conditioning
    * honored, at 8- or 12-bit sample precision, into (width, height, RGB
    * bytes row-major top-down — 12-bit normalizes to 8). Grayscale
    * replicates; the lossless/hierarchical modes refuse loudly.
    * Corruption guard: declared block counts are bounded by the entropy
    * payload size (Huffman ≥ ~3 bits/block; arithmetic a far more
    * generous 512 blocks/byte + 2^20 flat) — a pathological
    * arithmetic stream compressing beyond that bound is refused. */
  def decode(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(b.length > 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a JPEG (no SOI)")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = 0; var h = 0; var prec = 8
    var restartInterval = 0
    var arithCoded = false
    // arithmetic conditioning per table id (DAC overrides the defaults)
    val arithL = Array.fill(4)(ArithDcL)
    val arithU = Array.fill(4)(ArithDcU)
    val arithKx = Array.fill(4)(ArithAcKx)
    // per component: id, hSamp, vSamp, quantId, dcId, acId
    var comps: Array[Array[Int]] = null
    var scanStart = -1

    def u16(at: Int): Int = ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)

    while (scanStart < 0) {
      require(pos + 3 < b.length, "truncated JPEG (no SOS)")
      require((b(pos) & 0xff) == 0xff, s"bad marker sync at $pos")
      val m = b(pos + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 }
      else {
        val len = u16(pos + 2)
        val seg = pos + 4
        m match {
          case 0xdb => // DQT: one or more tables, 8- or 16-bit entries
            var p = seg
            while (p < pos + 2 + len) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              require(pq == 0 || pq == 1, s"bad quantization precision $pq")
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                t(Zigzag(i)) =
                  if (pq == 0) b(p + 1 + i) & 0xff
                  else ((b(p + 1 + 2 * i) & 0xff) << 8) | (b(p + 2 + 2 * i) & 0xff)
                i += 1
              }
              quant(tq) = t
              p += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val cls = (b(p) & 0xff) >> 4
              val id = b(p) & 0x0f
              val bits = new Array[Int](17)
              var total = 0
              var i = 1
              while (i <= 16) { bits(i) = b(p + i) & 0xff; total += bits(i); i += 1 }
              val vals = new Array[Int](total)
              i = 0
              while (i < total) { vals(i) = b(p + 17 + i) & 0xff; i += 1 }
              val t = new HuffTable(bits, vals)
              if (cls == 0) dcTables(id) = t else acTables(id) = t
              p += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc9 => // SOF0/SOF1 (Huffman) or SOF9 (arithmetic)
            arithCoded = m == 0xc9
            prec = b(seg) & 0xff
            require(prec == 8 || (prec == 12 && m != 0xc0),
              s"unsupported JPEG precision $prec for SOF ${m & 0xf}")
            h = u16(seg + 1); w = u16(seg + 3)
            val n = b(seg + 5) & 0xff
            require(n == 1 || n == 3, s"unsupported component count $n")
            comps = Array.tabulate(n) { i =>
              val o = seg + 6 + i * 3
              Array(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f,
                b(o + 2) & 0xff, 0, 0)
            }
          case 0xc2 | 0xca => // progressive (huffman or arithmetic):
            return decodeProgressive(b) // its own multi-scan decode path
          case 0xcc => // DAC: arithmetic conditioning (class<<4|id, Cs)
            var p = seg
            while (p + 1 < pos + 2 + len) {
              val cls = (b(p) & 0xff) >> 4
              val id = b(p) & 0x0f
              val cs = b(p + 1) & 0xff
              if (cls == 0) {
                arithL(id) = cs & 0x0f; arithU(id) = cs >> 4
                require(arithL(id) <= arithU(id) && arithU(id) <= 15,
                  s"bad DC conditioning L=${arithL(id)} U=${arithU(id)}")
              } else {
                require(cs >= 1 && cs <= 63, s"bad AC conditioning Kx=$cs")
                arithKx(id) = cs
              }
              p += 2
            }
          case sof if sof >= 0xc3 && sof <= 0xcf && sof != 0xc4 && sof != 0xc8 =>
            throw new IllegalArgumentException(
              f"unsupported JPEG coding (SOF marker 0x$sof%02x)")
          case 0xdd => restartInterval = u16(seg)
          case 0xda => // SOS
            require(comps != null, "SOS before SOF")
            val n = b(seg) & 0xff
            require(n == comps.length, "partial scans unsupported")
            var i = 0
            while (i < n) {
              val cid = b(seg + 1 + i * 2) & 0xff
              val tb = b(seg + 2 + i * 2) & 0xff
              val c = comps.find(_(0) == cid).getOrElse(
                throw new IllegalArgumentException(s"SOS names unknown component $cid"))
              c(4) = tb >> 4; c(5) = tb & 0x0f
              i += 1
            }
            scanStart = pos + 2 + len
          case _ => () // APPn / COM / others: skip
        }
        if (scanStart < 0) pos += 2 + len
      }
    }

    require(w > 0 && h > 0, "missing SOF dimensions")
    // T.81 A.2.2: a ONE-component scan is non-interleaved — the MCU is a
    // single 8x8 data unit and the declared sampling factors are IGNORED.
    // Forcing 1x1 reproduces that data-unit order exactly (libjpeg/JDK
    // write grayscale as 1x1 anyway, but other encoders may declare 2x2,
    // which would otherwise decode to silently wrong pixels).
    if (comps.length == 1) { comps(0)(1) = 1; comps(0)(2) = 1 }
    val hMax = comps.map(_(1)).max
    val vMax = comps.map(_(2)).max
    require(hMax >= 1 && hMax <= 4 && vMax >= 1 && vMax <= 4,
      "sampling factors out of range")
    val mcuW = hMax * 8; val mcuH = vMax * 8
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // plausibility: every 8x8 block costs >= ~3 bits of Huffman entropy
    // data (DC code + EOB), so declared dimensions wildly beyond the
    // payload are corruption — refuse BEFORE allocating GB-scale planes
    // for garbage. Arithmetic coding can compress a block far below a
    // bit, so its bound is much more generous — a bits-per-block floor
    // scaled by payload size plus a flat allowance (a fixed 2^20 cap
    // rejected legitimate large images: an 8000x6000 4:4:4 SOF9 file is
    // ~2.25M blocks).
    val blocksPerMcu = comps.map(c => c(1) * c(2)).sum
    val totalBlocks = mcusX.toLong * mcusY * blocksPerMcu
    if (arithCoded)
      require(totalBlocks <=
          512L * math.max(0, b.length - scanStart) + (1L << 20),
        s"implausible arithmetic JPEG: $totalBlocks blocks declared for " +
          s"${b.length - scanStart} entropy bytes")
    else
      require(totalBlocks <= 24L * math.max(0, b.length - scanStart) + 64,
        s"corrupt JPEG: $totalBlocks blocks declared for " +
          s"${b.length - scanStart} entropy bytes")
    // ABSOLUTE memory cap alongside the payload-proportional bounds: the
    // generous arithmetic ratio still lets a ~2 MB crafted SOF9 declare
    // ~1e9 blocks (~550 GB of Double planes), and the resulting
    // OutOfMemoryError is not NonFatal — it would bypass the stub fallback
    // and kill the executor. 64 samples × 8 bytes per block against a
    // fixed 4 GiB plane budget (an 8000×6000 4:4:4 frame is ~1.2 GiB —
    // comfortably inside; nothing legitimate in a document corpus comes
    // near the cap).
    require(totalBlocks <= (4L << 30) / (64L * 8L),
      s"implausible JPEG: $totalBlocks blocks would allocate " +
        s"${totalBlocks * 64L * 8L} bytes of pixel planes")
    // per-component pixel planes at the component's own resolution
    val planeW = comps.map(c => mcusX * c(1) * 8)
    val planeH = comps.map(c => mcusY * c(2) * 8)
    val planes = comps.indices.map(i => new Array[Double](planeW(i) * planeH(i))).toArray

    val br = new BitReader(b, scanStart)
    val pred = new Array[Int](comps.length)
    // arithmetic entropy state (SOF9): the Annex D decoder plus the
    // Annex F statistics — contexts per conditioning table, DC difference
    // classes and predictors per component
    require(!arithCoded || restartInterval == 0,
      "restart intervals with arithmetic coding unsupported")
    val ad = if (arithCoded) new JpegArith.Decoder(b, scanStart) else null
    val dcStatsD = Array.fill(4)(JpegArith.freshBins(64))
    val acStatsD = Array.fill(4)(JpegArith.freshBins(256))
    val fixedBinD = Array(JpegArith.FixedBin << 1)
    val dcCtx = new Array[Int](comps.length)

    // F.2.4.1: DC difference — mirrors the encoder's decision order exactly
    def arithDecodeDc(ci: Int, tbl: Int): Unit = {
      val stats = dcStatsD(tbl)
      val base = dcCtx(ci)
      if (ad.decode(stats, base) == 0) dcCtx(ci) = 0
      else {
        val sign = ad.decode(stats, base + 1)
        var m = 0
        var v = 0
        if (ad.decode(stats, base + 2 + sign) != 0) {
          m = 1
          var st = 20
          while (ad.decode(stats, st) != 0) {
            m <<= 1
            require(m < 0x8000, "corrupt JPEG: runaway arithmetic DC magnitude")
            st += 1
          }
          v = m
          var mm = m >> 1
          while (mm != 0) {
            if (ad.decode(stats, st + 14) != 0) v |= mm
            mm >>= 1
          }
        }
        dcCtx(ci) =
          if (m < ((1 << arithL(tbl)) >> 1)) 0
          else if (m > ((1 << arithU(tbl)) >> 1)) 12 + sign * 4
          else 4 + sign * 4
        pred(ci) += (if (sign == 1) -(v + 1) else v + 1)
      }
    }

    // F.2.4.2: AC band — EOB/run/value decisions per position
    def arithDecodeAc(tbl: Int, coef: Array[Double], q: Array[Int]): Unit = {
      val stats = acStatsD(tbl)
      var k = 1
      var done = false
      while (k <= 63 && !done) {
        var st = 3 * (k - 1)
        if (ad.decode(stats, st) != 0) done = true // end-of-block
        else {
          while (ad.decode(stats, st + 1) == 0) {
            st += 3; k += 1
            require(k <= 63, "corrupt JPEG: arithmetic AC run past 63")
          }
          val sign = ad.decode(fixedBinD, 0)
          var v = 0
          if (ad.decode(stats, st + 2) != 0) {
            if (ad.decode(stats, st + 2) == 0) v = 1
            else {
              var m = 2
              var xst = if (k <= arithKx(tbl)) 189 else 217
              while (ad.decode(stats, xst) != 0) {
                m <<= 1
                require(m < 0x8000, "corrupt JPEG: runaway arithmetic AC magnitude")
                xst += 1
              }
              v = m
              var mm = m >> 1
              while (mm != 0) {
                if (ad.decode(stats, xst + 14) != 0) v |= mm
                mm >>= 1
              }
            }
          }
          val mag = v + 1
          coef(Zigzag(k)) = (if (sign == 1) -mag else mag).toDouble * q(Zigzag(k))
          k += 1
        }
      }
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(((mcu / restartInterval) - 1) & 7)
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c(3))
        require(q != null, s"missing quantization table ${c(3)}")
        val dcT = dcTables(c(4)); val acT = acTables(c(5))
        require(arithCoded || (dcT != null && acT != null),
          "missing Huffman table")
        var v = 0
        while (v < c(2)) {
          var hh = 0
          while (hh < c(1)) {
            // decode one 8x8 block
            val coef = new Array[Double](64)
            if (arithCoded) {
              arithDecodeDc(ci, c(4))
              coef(0) = pred(ci).toDouble * q(0)
              arithDecodeAc(c(5), coef, q)
            } else {
            val cat = br.decodeHuff(dcT)
            pred(ci) += extend(br.bits(cat), cat)
            coef(0) = pred(ci).toDouble * q(0)
            var k = 1
            var done = false
            while (k < 64 && !done) {
              val rs = br.decodeHuff(acT)
              val run = rs >> 4; val sz = rs & 0x0f
              if (sz == 0) {
                if (run == 15) k += 16 // ZRL
                else done = true // EOB
              } else {
                k += run
                require(k < 64, "corrupt JPEG: AC index past 63")
                coef(Zigzag(k)) = extend(br.bits(sz), sz).toDouble * q(Zigzag(k))
                k += 1
              }
            }
            }
            val px = idct(coef)
            val bx = (mx * c(1) + hh) * 8; val byy = (my * c(2) + v) * 8
            // normalize to the 8-bit domain at fill time: 12-bit samples
            // carry 16x the amplitude and a 2048 level shift
            val inv = 1.0 / (1 << (prec - 8))
            var i = 0
            while (i < 64) {
              planes(ci)((byy + i / 8) * planeW(ci) + bx + i % 8) =
                px(i) * inv + 128
              i += 1
            }
            hh += 1
          }
          v += 1
        }
        ci += 1
      }
      mcu += 1
    }

    renderRgb(w, h, comps, hMax, vMax, planes, planeW)
  }

  /** Decode a PROGRESSIVE (SOF2) Huffman JPEG. T.81 G: every scan carries
    * a spectral band [Ss, Se] and a successive-approximation bit range
    * (Ah, Al); DC-first scans (interleaved allowed) code `diff << Al`,
    * DC-refinement scans append one bit per block, AC-first scans code a
    * single component's band with EOB-RUN codes, AC-refinement scans
    * apply the G.2.2 correction procedure (one bit per already-nonzero
    * coefficient, sign-coded new coefficients between them). Coefficients
    * accumulate in a full per-component buffer; one dequant+IDCT pass at
    * EOI renders the image. Restart markers reset DC predictors AND the
    * EOB run, with the RSTn modulo-8 index checked per scan. */
  private def decodeProgressive(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = 0; var h = 0
    var restartInterval = 0
    var arithCoded = false // SOF10: arithmetic entropy, Annex G/F models
    val arithL = Array.fill(4)(ArithDcL)
    val arithU = Array.fill(4)(ArithDcU)
    val arithKx = Array.fill(4)(ArithAcKx)
    // per component: id, hSamp, vSamp, quantId, dcId, acId
    var comps: Array[Array[Int]] = null
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0; var prec = 8
    // per component: coefficient buffer over the MCU-padded block grid
    // (natural order within each 64-coef block), and its width in blocks
    var coefs: Array[Array[Int]] = null
    var gridW: Array[Int] = null
    var gridH: Array[Int] = null
    var eobrun = 0

    def u16(at: Int): Int = ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)

    /** One scan's entropy-coded data, starting at `start`; returns the
      * position of the next marker. */
    def decodeScan(scanComps: Array[Int], Ss: Int, Se: Int, Ah: Int,
        Al: Int, start: Int): Int = {
      val br = new BitReader(b, start)
      val pred = new Array[Int](comps.length)
      eobrun = 0
      val p1 = 1 << Al
      val m1 = -1 << Al
      // arithmetic (SOF10): each scan is an independent entropy segment —
      // a fresh Annex D decoder, fresh statistics, fresh DC contexts
      require(!arithCoded || restartInterval == 0,
        "restart intervals with arithmetic coding unsupported")
      val ad = if (arithCoded) new JpegArith.Decoder(b, start) else null
      val adDc = if (arithCoded) Array.fill(4)(JpegArith.freshBins(64)) else null
      val adAc = if (arithCoded) Array.fill(4)(JpegArith.freshBins(256)) else null
      val adFixed = if (arithCoded) Array(JpegArith.FixedBin << 1) else null
      val adDcCtx = new Array[Int](comps.length)

      // G.2.1 DC first: the sequential Annex F DC model over the
      // point-transformed values, result placed at << Al
      def adDcFirst(ci: Int, base: Int): Unit = {
        val tbl = comps(ci)(4)
        val stats = adDc(tbl)
        val ctx = adDcCtx(ci)
        if (ad.decode(stats, ctx) == 0) adDcCtx(ci) = 0
        else {
          val sign = ad.decode(stats, ctx + 1)
          var m = 0
          var v = 0
          if (ad.decode(stats, ctx + 2 + sign) != 0) {
            m = 1
            var st = 20
            while (ad.decode(stats, st) != 0) {
              m <<= 1
              require(m < 0x8000, "corrupt JPEG: runaway arithmetic DC magnitude")
              st += 1
            }
            v = m
            var mm = m >> 1
            while (mm != 0) {
              if (ad.decode(stats, st + 14) != 0) v |= mm
              mm >>= 1
            }
          }
          adDcCtx(ci) =
            if (m < ((1 << arithL(tbl)) >> 1)) 0
            else if (m > ((1 << arithU(tbl)) >> 1)) 12 + sign * 4
            else 4 + sign * 4
          pred(ci) += (if (sign == 1) -(v + 1) else v + 1)
        }
        coefs(ci)(base) = pred(ci) << Al
      }

      // G.2.1 DC refinement: one fixed-bin decision per block (bit Al)
      def adDcRefine(ci: Int, base: Int): Unit =
        if (ad.decode(adFixed, 0) != 0) coefs(ci)(base) |= p1

      // G.2.2 AC first: the sequential Annex F AC model over [Ss, Se],
      // values placed at << Al
      def adAcFirst(ci: Int, base: Int): Unit = {
        val tbl = comps(ci)(5)
        val stats = adAc(tbl)
        val co = coefs(ci)
        var k = Ss
        var done = false
        while (k <= Se && !done) {
          var st = 3 * (k - 1)
          if (ad.decode(stats, st) != 0) done = true // end-of-block
          else {
            while (ad.decode(stats, st + 1) == 0) {
              st += 3; k += 1
              require(k <= Se, "corrupt JPEG: arithmetic AC run past band")
            }
            val sign = ad.decode(adFixed, 0)
            var v = 0
            if (ad.decode(stats, st + 2) != 0) {
              if (ad.decode(stats, st + 2) == 0) v = 1
              else {
                var m = 2
                var xst = if (k <= arithKx(tbl)) 189 else 217
                while (ad.decode(stats, xst) != 0) {
                  m <<= 1
                  require(m < 0x8000, "corrupt JPEG: runaway arithmetic AC magnitude")
                  xst += 1
                }
                v = m
                var mm = m >> 1
                while (mm != 0) {
                  if (ad.decode(stats, xst + 14) != 0) v |= mm
                  mm >>= 1
                }
              }
            }
            val mag = v + 1
            co(base + Zigzag(k)) = (if (sign == 1) -mag else mag) << Al
            k += 1
          }
        }
      }

      // G.2.2 AC refinement: correction bit per nonzero-history
      // coefficient, presence+sign for the newly nonzero, EOB decisions
      // only past kex (the previous scans' highest nonzero position)
      def adAcRefine(ci: Int, base: Int): Unit = {
        val tbl = comps(ci)(5)
        val stats = adAc(tbl)
        val co = coefs(ci)
        var kex = Se
        while (kex > 0 && co(base + Zigzag(kex)) == 0) kex -= 1
        var k = Ss
        var done = false
        while (k <= Se && !done) {
          var st = 3 * (k - 1)
          if (k > kex && ad.decode(stats, st) != 0) done = true // EOB
          else {
            var placed = false
            while (!placed) {
              val z = base + Zigzag(k)
              if (co(z) != 0) {
                if (ad.decode(stats, st + 2) != 0)
                  co(z) += (if (co(z) >= 0) p1 else m1)
                placed = true
              } else if (ad.decode(stats, st + 1) != 0) {
                co(z) = if (ad.decode(adFixed, 0) == 1) m1 else p1
                placed = true
              } else {
                st += 3; k += 1
                require(k <= Se,
                  "corrupt JPEG: arithmetic AC refinement past band")
              }
            }
            k += 1
          }
        }
      }

      def refineNonzero(co: Array[Int], z: Int): Unit =
        if (br.bit() == 1 && (co(z) & p1) == 0)
          co(z) += (if (co(z) >= 0) p1 else m1)

      def dcBlock(ci: Int, base: Int): Unit = {
        val co = coefs(ci)
        if (Ah == 0) {
          val dcT = dcTables(comps(ci)(4))
          require(dcT != null, "missing DC Huffman table")
          val cat = br.decodeHuff(dcT)
          pred(ci) += extend(br.bits(cat), cat)
          co(base) = pred(ci) << Al
        } else {
          if (br.bit() == 1) co(base) |= p1
        }
      }

      def acFirstBlock(ci: Int, base: Int): Unit = {
        val co = coefs(ci)
        val acT = acTables(comps(ci)(5))
        require(acT != null, "missing AC Huffman table")
        if (eobrun > 0) { eobrun -= 1; return }
        var k = Ss
        var break = false
        while (k <= Se && !break) {
          val rs = br.decodeHuff(acT)
          val r = rs >> 4; val s = rs & 0x0f
          if (s == 0) {
            if (r < 15) { eobrun = (1 << r) - 1 + br.bits(r); break = true }
            else k += 16 // ZRL
          } else {
            k += r
            require(k <= Se, "corrupt JPEG: AC index past spectral end")
            co(base + Zigzag(k)) = extend(br.bits(s), s) << Al
            k += 1
          }
        }
      }

      def acRefineBlock(ci: Int, base: Int): Unit = {
        val co = coefs(ci)
        val acT = acTables(comps(ci)(5))
        require(acT != null, "missing AC Huffman table")
        var k = Ss
        if (eobrun == 0) {
          var break = false
          while (k <= Se && !break) {
            val rs = br.decodeHuff(acT)
            var r = rs >> 4; val s = rs & 0x0f
            var newVal = 0
            if (s == 0) {
              if (r < 15) { eobrun = (1 << r) + br.bits(r); break = true }
              // else ZRL: pass 16 zero-HISTORY coefficients, no new value
            } else {
              require(s == 1, "corrupt JPEG: refinement magnitude != 1")
              newVal = if (br.bit() == 1) p1 else m1
            }
            if (!break) {
              // advance past `r` zero-history coefficients (placing the
              // new value on the one after), reading a correction bit for
              // every nonzero-history coefficient passed over
              var placed = false
              while (k <= Se && !placed) {
                val z = base + Zigzag(k)
                if (co(z) != 0) refineNonzero(co, z)
                else if (r == 0) { if (newVal != 0) co(z) = newVal; placed = true }
                else r -= 1
                k += 1
              }
              require(placed || newVal == 0,
                "corrupt JPEG: refinement ran past the spectral band")
            }
          }
        }
        if (eobrun > 0) {
          // EOB band covers the rest of this block: correction bits only
          while (k <= Se) {
            val z = base + Zigzag(k)
            if (co(z) != 0) refineNonzero(co, z)
            k += 1
          }
          eobrun -= 1
        }
      }

      def decodeUnit(ci: Int, base: Int): Unit =
        if (arithCoded) {
          if (Ss == 0) { if (Ah == 0) adDcFirst(ci, base) else adDcRefine(ci, base) }
          else if (Ah == 0) adAcFirst(ci, base)
          else adAcRefine(ci, base)
        } else if (Ss == 0) dcBlock(ci, base)
        else if (Ah == 0) acFirstBlock(ci, base)
        else acRefineBlock(ci, base)

      def atRestart(unit: Long): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart((((unit / restartInterval) - 1) & 7).toInt)
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }

      if (scanComps.length > 1) {
        // interleaved scan: T.81 allows this only for DC (Ss == 0)
        require(Ss == 0 && Se == 0,
          "corrupt JPEG: interleaved progressive AC scan")
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total) {
          atRestart(mcu)
          val mx = mcu % mcusX; val my = mcu / mcusX
          scanComps.foreach { ci =>
            val c = comps(ci)
            var v = 0
            while (v < c(2)) {
              var hh = 0
              while (hh < c(1)) {
                val idx = (my * c(2) + v) * gridW(ci) + mx * c(1) + hh
                decodeUnit(ci, idx * 64)
                hh += 1
              }
              v += 1
            }
          }
          mcu += 1
        }
      } else {
        // non-interleaved: the component's own ceil-dimension block grid,
        // raster order, one block per restart unit
        val ci = scanComps(0)
        val c = comps(ci)
        val cw = (w * c(1) + hMax - 1) / hMax
        val ch = (h * c(2) + vMax - 1) / vMax
        val nbw = (cw + 7) / 8
        val nbh = (ch + 7) / 8
        var blk = 0
        val total = nbw.toLong * nbh
        while (blk < total) {
          atRestart(blk.toLong)
          val idx = (blk / nbw) * gridW(ci) + blk % nbw
          decodeUnit(ci, idx * 64)
          blk += 1
        }
      }
      if (arithCoded) {
        // arithmetic entropy data has no FF00 stuffing: an X'FF' followed
        // by <= X'8F' is data (stuffed-bit byte); the first X'FF' with a
        // follower above X'8F' is the next marker
        var p = math.max(ad.pos, start)
        var found = -1
        while (found < 0 && p + 1 < b.length) {
          if ((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) > 0x8f) found = p
          else p += 1
        }
        require(found >= 0, "truncated progressive JPEG (no marker after scan)")
        found
      } else {
      // advance to the next marker (skip entropy bytes, FF00 stuffing and
      // any RSTn the bit reader stopped just short of)
      var p = br.pos
      var found = -1
      while (found < 0 && p + 1 < b.length) {
        if ((b(p) & 0xff) == 0xff) {
          val nx = b(p + 1) & 0xff
          if (nx == 0x00 || (nx >= 0xd0 && nx <= 0xd7)) p += 2
          else if (nx == 0xff) p += 1
          else found = p
        } else p += 1
      }
      require(found >= 0, "truncated progressive JPEG (no marker after scan)")
      found
      }
    }

    var done = false
    while (!done) {
      require(pos + 1 < b.length, "truncated progressive JPEG")
      require((b(pos) & 0xff) == 0xff, s"bad marker sync at $pos")
      val m = b(pos + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 }
      else if (m == 0xd9) { done = true }
      else {
        val len = u16(pos + 2)
        val seg = pos + 4
        var nextPos = pos + 2 + len
        m match {
          case 0xdb =>
            var p = seg
            while (p < pos + 2 + len) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              require(pq == 0 || pq == 1, s"bad quantization precision $pq")
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                t(Zigzag(i)) =
                  if (pq == 0) b(p + 1 + i) & 0xff
                  else ((b(p + 1 + 2 * i) & 0xff) << 8) | (b(p + 2 + 2 * i) & 0xff)
                i += 1
              }
              quant(tq) = t
              p += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc4 =>
            var p = seg
            while (p < pos + 2 + len) {
              val cls = (b(p) & 0xff) >> 4
              val id = b(p) & 0x0f
              val bits = new Array[Int](17)
              var total = 0
              var i = 1
              while (i <= 16) { bits(i) = b(p + i) & 0xff; total += bits(i); i += 1 }
              val vals = new Array[Int](total)
              i = 0
              while (i < total) { vals(i) = b(p + 17 + i) & 0xff; i += 1 }
              val t = new HuffTable(bits, vals)
              if (cls == 0) dcTables(id) = t else acTables(id) = t
              p += 17 + total
            }
          case 0xc2 | 0xca =>
            require(comps == null, "multiple SOF markers")
            arithCoded = m == 0xca
            prec = b(seg) & 0xff
            require(prec == 8 || prec == 12, s"unsupported JPEG precision $prec")
            h = u16(seg + 1); w = u16(seg + 3)
            require(w > 0 && h > 0, "missing SOF dimensions")
            val n = b(seg + 5) & 0xff
            require(n == 1 || n == 3, s"unsupported component count $n")
            comps = Array.tabulate(n) { i =>
              val o = seg + 6 + i * 3
              Array(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f,
                b(o + 2) & 0xff, 0, 0)
            }
            // T.81 A.2.2: one-component images scan non-interleaved — the
            // declared sampling factors are ignored (same as baseline)
            if (comps.length == 1) { comps(0)(1) = 1; comps(0)(2) = 1 }
            hMax = comps.map(_(1)).max; vMax = comps.map(_(2)).max
            require(hMax >= 1 && hMax <= 4 && vMax >= 1 && vMax <= 4,
              "sampling factors out of range")
            mcusX = (w + hMax * 8 - 1) / (hMax * 8)
            mcusY = (h + vMax * 8 - 1) / (vMax * 8)
            // plausibility: refuse GB-scale coefficient buffers declared
            // by a tiny payload (the multi-scan analogue of the baseline
            // entropy bound)
            val totalBlocks = comps.map(c =>
              mcusX.toLong * c(1) * mcusY * c(2)).sum
            require(totalBlocks <= 24L * b.length + 64,
              s"corrupt JPEG: $totalBlocks blocks declared for " +
                s"${b.length} total bytes")
            gridW = comps.map(c => mcusX * c(1))
            gridH = comps.map(c => mcusY * c(2))
            coefs = comps.indices.map(i =>
              new Array[Int](gridW(i) * gridH(i) * 64)).toArray
          case 0xcc => // DAC: arithmetic conditioning (class<<4|id, Cs)
            var p = seg
            while (p + 1 < pos + 2 + len) {
              val cls = (b(p) & 0xff) >> 4
              val id = b(p) & 0x0f
              val cs = b(p + 1) & 0xff
              if (cls == 0) {
                arithL(id) = cs & 0x0f; arithU(id) = cs >> 4
                require(arithL(id) <= arithU(id) && arithU(id) <= 15,
                  s"bad DC conditioning L=${arithL(id)} U=${arithU(id)}")
              } else {
                require(cs >= 1 && cs <= 63, s"bad AC conditioning Kx=$cs")
                arithKx(id) = cs
              }
              p += 2
            }
          case sof if (sof >= 0xc0 && sof <= 0xcf) && sof != 0xc4 && sof != 0xc8 =>
            throw new IllegalArgumentException(
              f"unexpected SOF marker 0x$sof%02x inside a progressive stream")
          case 0xdd => restartInterval = u16(seg)
          case 0xda =>
            require(comps != null, "SOS before SOF")
            val ns = b(seg) & 0xff
            require(ns >= 1 && ns <= comps.length, s"bad scan component count $ns")
            // all-components or single-component scans only: a 2-of-3
            // interleaved DC scan would need scan-local MCU geometry —
            // no common encoder emits one; refuse rather than misdecode
            require(ns == comps.length || ns == 1,
              s"partial multi-component progressive scan unsupported ($ns of ${comps.length})")
            val scanComps = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = b(seg + 1 + i * 2) & 0xff
              val tb = b(seg + 2 + i * 2) & 0xff
              val ci = comps.indexWhere(_(0) == cid)
              require(ci >= 0, s"SOS names unknown component $cid")
              comps(ci)(4) = tb >> 4; comps(ci)(5) = tb & 0x0f
              scanComps(i) = ci
              i += 1
            }
            val ss = b(seg + 1 + ns * 2) & 0xff
            val se = b(seg + 2 + ns * 2) & 0xff
            val a = b(seg + 3 + ns * 2) & 0xff
            val ah = a >> 4; val al = a & 0x0f
            require(ss <= 63 && se <= 63 && ss <= se,
              s"bad spectral band [$ss, $se]")
            require(ss != 0 || se == 0, "DC scan with nonzero spectral end")
            require(ss == 0 || ns == 1,
              "corrupt JPEG: progressive AC scan must be single-component")
            require(al <= 13 && (ah == 0 || ah == al + 1),
              s"bad successive approximation ($ah, $al)")
            nextPos = decodeScan(scanComps, ss, se, ah, al, pos + 2 + len)
          case _ => () // APPn / COM: skip
        }
        pos = nextPos
      }
    }
    require(comps != null, "progressive JPEG without SOF2")

    // render: dequantize + IDCT every block of every component's padded
    // grid, then the shared upsample + color convert
    val planeW = comps.indices.map(i => gridW(i) * 8)
    val planes = comps.indices.map(i =>
      new Array[Double](gridW(i) * 8 * gridH(i) * 8)).toArray
    var ci = 0
    while (ci < comps.length) {
      val q = quant(comps(ci)(3))
      require(q != null, s"missing quantization table ${comps(ci)(3)}")
      val co = coefs(ci)
      val block = new Array[Double](64)
      var bRow = 0
      while (bRow < gridH(ci)) {
        var bCol = 0
        while (bCol < gridW(ci)) {
          val base = (bRow * gridW(ci) + bCol) * 64
          var i = 0
          while (i < 64) { block(i) = co(base + i).toDouble * q(i); i += 1 }
          val px = idct(block)
          val bx = bCol * 8; val byy = bRow * 8
          var j = 0
          while (j < 64) {
            planes(ci)((byy + j / 8) * planeW(ci) + bx + j % 8) =
              px(j) / (1 << (prec - 8)) + 128
            j += 1
          }
          bCol += 1
        }
        bRow += 1
      }
      ci += 1
    }
    renderRgb(w, h, comps, hMax, vMax, planes, planeW)
  }

  /** Shared render tail for the sequential and progressive decoders:
    * nearest-neighbor chroma upsample + BT.601 YCbCr→RGB (grayscale
    * replicates), reading each component's own-resolution plane. */
  private def renderRgb(w: Int, h: Int, comps: Array[Array[Int]],
      hMax: Int, vMax: Int, planes: Array[Array[Double]],
      planeW: Seq[Int]): (Int, Int, Array[Byte]) = {
    val rgb = new Array[Byte](w * h * 3)
    def clamp(d: Double): Byte =
      math.max(0, math.min(255, math.round(d))).toByte
    var y0 = 0
    while (y0 < h) {
      var x0 = 0
      while (x0 < w) {
        def sample(ci: Int): Double = {
          val c = comps(ci)
          val sx = x0 * c(1) / hMax; val sy = y0 * c(2) / vMax
          planes(ci)(sy * planeW(ci) + sx)
        }
        val o = (y0 * w + x0) * 3
        if (comps.length == 1) {
          val g = clamp(sample(0))
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
        } else {
          val yv = sample(0); val cb = sample(1) - 128; val cr = sample(2) - 128
          rgb(o) = clamp(yv + 1.402 * cr)
          rgb(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = clamp(yv + 1.772 * cb)
        }
        x0 += 1
      }
      y0 += 1
    }
    (w, h, rgb)
  }
}
