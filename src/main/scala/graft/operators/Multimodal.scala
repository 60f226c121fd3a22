package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the pipeline
  * as opaque `binary` payloads with a typed metadata struct alongside.
  *
  * The Spark side — schema, partition-sized batching, typed mapPartitions,
  * pushdown-friendly metadata columns — is real and tested, and so is the
  * decode for the public formats: 24-bit BMP and binary PPM pixels, PNG
  * (deflate + scanline filters via `java.util.zip.Inflater` —
  * gray/RGB/palette/alpha, every legal bit depth 1/2/4/8/16, interlaced
  * or not), baseline AND progressive JPEG ([[JpegCodec]]: huffman + DCT +
  * YCbCr incl. 4:2:0 subsampling, restart markers, spectral selection +
  * successive approximation, pure JVM), and PCM-16 WAV samples
  * ([[MediaCodec.decode]] — no codec dependencies anywhere). Payloads in
  * formats that DO need a codec library (MP3, H.264, 12-bit/arithmetic
  * JPEG…) fall back to the deterministic [[MediaCodec.decodeStub]]; swap
  * that arm for a JNI/FFI decoder without touching the surrounding plan.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      byte_len: Long)

  /** Decoded features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Double])

  object MediaCodec {

    // ------------------------------------------------ real decoders (JVM)
    // BMP (24-bit BI_RGB), binary PPM (P6), and PCM WAV decode with no
    // codec libraries: these public formats are header + raw samples, so a
    // few dozen lines of byte arithmetic replace the round-8 stub for any
    // payload that carries them. Unrecognized/corrupt payloads still fall
    // back to [[decodeStub]] so mixed corpora never fail mid-pipeline.

    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def i32le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    /** Encode an RGB image (row-major, top-down, 3 bytes/pixel) as a
      * 24-bit uncompressed BMP — the writer side of [[decodeBmp]], used by
      * the contract tests to synthesize real in-corpus image bytes. */
    def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
      val rowSize = (w * 3 + 3) / 4 * 4
      val out = java.nio.ByteBuffer.allocate(54 + rowSize * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
        .putInt(0).putInt(54) // reserved, pixel offset
      out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      var y = h - 1 // BMP rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          out.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR on disk
          x += 1
        }
        var pad = rowSize - w * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        y -= 1
      }
      out.array()
    }

    /** Decode a 24-bit uncompressed BMP into (width, height, RGB bytes
      * row-major top-down). Throws on anything that is not one. */
    def decodeBmp(b: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
      val offset = i32le(b, 10)
      val w = i32le(b, 18)
      val hRaw = i32le(b, 22)
      val h = math.abs(hRaw) // negative height = top-down row order
      require(u16le(b, 28) == 24, s"only 24-bit BMP (got ${u16le(b, 28)})")
      require(i32le(b, 30) == 0, "only uncompressed (BI_RGB) BMP")
      require(w > 0 && h > 0 && w * h <= (b.length - offset),
        "BMP dimensions exceed payload")
      val rowSize = (w * 3 + 3) / 4 * 4
      val rgb = new Array[Byte](w * h * 3)
      var row = 0
      while (row < h) {
        val srcY = if (hRaw > 0) h - 1 - row else row // bottom-up vs top-down
        var x = 0
        while (x < w) {
          val s = offset + srcY * rowSize + x * 3
          val d = (row * w + x) * 3
          rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
          x += 1
        }
        row += 1
      }
      (w, h, rgb)
    }

    /** Decode a binary PPM (`P6`): ASCII header (whitespace/comment
      * tolerant), then raw RGB — already row-major top-down. */
    def decodePpm(b: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(b.length > 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
      var i = 2
      def token(): Int = {
        while (i < b.length && (b(i).toChar.isWhitespace || b(i) == '#'))
          if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else i += 1
        var v = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
        v
      }
      val w = token(); val h = token(); val maxVal = token()
      i += 1 // single whitespace after maxval
      require(w > 0 && h > 0 && maxVal == 255, "unsupported PPM header")
      require(b.length - i >= w * h * 3, "PPM payload truncated")
      (w, h, java.util.Arrays.copyOfRange(b, i, i + w * h * 3))
    }

    // ------------------------------------------------------------- PNG
    // PNG is deflate + per-scanline filters — decodable with
    // java.util.zip.Inflater and byte arithmetic, zero codec libraries.
    // Supported: 8-bit channel depth, color types 0 (gray), 2 (RGB),
    // 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced. Adam7
    // interlace and 1/2/4/16-bit depths refuse loudly (decode() then
    // falls back to the stub, so mixed corpora keep flowing).

    private def i32be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    private val PngSig =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def channelsOf(colorType: Int): Int = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case t => throw new IllegalArgumentException(s"unsupported PNG color type $t")
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Encode raw 8-bit scanlines as a PNG — the writer side of
      * [[decodePng]]. `px` is row-major top-down, `channelsOf(colorType)`
      * bytes per pixel, ALWAYS 8 bits per sample on input; `bitDepth`
      * selects the on-wire depth: 16 widens each sample to `v×257` (decode
      * takes the high byte back — identity round-trip), 1/2/4 pack
      * MSB-first (gray samples quantize via `v >> (8−d)`, so inputs on the
      * `k×255/(2^d−1)` lattice round-trip exactly; palette INDICES pack
      * verbatim). Each row carries filter `y % 5`, so a round-trip
      * exercises every unfilter path (None/Sub/Up/Average/Paeth), making
      * the encode→decode pair a real conformance check, not an identity. */
    def encodePng(w: Int, h: Int, colorType: Int, px: Array[Byte],
        palette: Array[Byte] = null, bitDepth: Int = 8): Array[Byte] = {
      val bpp = channelsOf(colorType)
      require(px.length == w * h * bpp,
        s"need ${w * h * bpp} bytes for ${w}x$h type-$colorType, got ${px.length}")
      val legal = colorType match {
        case 0 => Set(1, 2, 4, 8, 16)
        case 3 => Set(1, 2, 4, 8)
        case _ => Set(8, 16)
      }
      require(legal(bitDepth),
        s"illegal PNG depth $bitDepth for color type $colorType")
      val bitsPP = bitDepth * bpp
      val delta = math.max(1, bitsPP / 8)
      val rowB = (w * bitsPP + 7) / 8
      // pack the 8-bit input samples to the on-wire depth, row-major
      val packed = new Array[Byte](h * rowB)
      var py = 0
      while (py < h) {
        var s = 0
        while (s < w * bpp) {
          val v = px(py * w * bpp + s) & 0xff
          bitDepth match {
            case 8 => packed(py * rowB + s) = v.toByte
            case 16 =>
              packed(py * rowB + 2 * s) = v.toByte     // v16 = v*257:
              packed(py * rowB + 2 * s + 1) = v.toByte // high == low == v
            case d =>
              val q = if (colorType == 3) {
                require(v < (1 << d), s"palette index $v exceeds depth $d")
                v
              } else v >> (8 - d)
              val bitOff = s * d
              val shift = 8 - d - (bitOff & 7)
              val idx = py * rowB + (bitOff >> 3)
              packed(idx) = ((packed(idx) & 0xff) | (q << shift)).toByte
          }
          s += 1
        }
        py += 1
      }
      val raw = new Array[Byte](h * (1 + rowB))
      var y = 0
      while (y < h) {
        val f = y % 5
        raw(y * (1 + rowB)) = f.toByte
        var x = 0
        while (x < rowB) {
          val cur = packed(y * rowB + x) & 0xff
          val left = if (x >= delta) packed(y * rowB + x - delta) & 0xff else 0
          val up = if (y > 0) packed((y - 1) * rowB + x) & 0xff else 0
          val ul = if (x >= delta && y > 0) packed((y - 1) * rowB + x - delta) & 0xff else 0
          val v = f match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - ((left + up) >> 1)
            case 4 => cur - paeth(left, up, ul)
          }
          raw(y * (1 + rowB) + 1 + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val zOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) zOut.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val out = new java.io.ByteArrayOutputStream(zOut.size + 128)
      out.write(PngSig)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
        val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      }
      chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(bitDepth.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array())
      if (colorType == 3) {
        require(palette != null && palette.length % 3 == 0 &&
          palette.length <= 768, "palette PNG needs a <=256-entry RGB PLTE")
        chunk("PLTE", palette)
      }
      chunk("IDAT", zOut.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Decode a PNG into (width, height, RGB bytes row-major top-down):
      * walks the chunk list, inflates the concatenated IDAT zlib stream,
      * unfilters each scanline (None/Sub/Up/Average/Paeth) — per Adam7
      * PASS for interlaced files, scattering each sub-image onto the grid
      * — then expands gray/palette/alpha channels to RGB (alpha dropped).
      * All legal bit depths decode: 16-bit scales to 8 (high byte), 1/2/4
      * unpack MSB-first (gray samples rescale to full range, palette
      * indices dereference unscaled), per the PNG spec's depth/colorType
      * matrix — illegal combinations refuse loudly. */
    def decodePng(b: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(b.length > 8 + 25 && java.util.Arrays.equals(
        java.util.Arrays.copyOf(b, 8), PngSig), "not a PNG")
      var i = 8
      var w = 0; var h = 0; var bitDepth = -1; var colorType = -1; var interlace = 0
      var palette: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && i + 8 <= b.length) {
        val len = i32be(b, i)
        require(len >= 0 && i + 12 + len <= b.length, "PNG chunk exceeds payload")
        new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII) match {
          case "IHDR" =>
            require(len == 13, "malformed IHDR")
            w = i32be(b, i + 8); h = i32be(b, i + 12)
            bitDepth = b(i + 16) & 0xff; colorType = b(i + 17) & 0xff
            interlace = b(i + 20) & 0xff
          case "PLTE" => palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
          case "IDAT" => idat.write(b, i + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks (tEXt, gAMA, …) skip
        }
        i += 12 + len
      }
      require(bitDepth >= 0 && w > 0 && h > 0, "missing/empty IHDR")
      require(interlace == 0 || interlace == 1,
        s"unknown PNG interlace method $interlace")
      val legalDepths: Set[Int] = colorType match {
        case 0 => Set(1, 2, 4, 8, 16) // grayscale
        case 3 => Set(1, 2, 4, 8)     // palette indices
        case 2 | 4 | 6 => Set(8, 16)  // RGB / gray+alpha / RGBA
        case other =>
          throw new IllegalArgumentException(s"unknown PNG color type $other")
      }
      require(legalDepths(bitDepth),
        s"illegal PNG depth $bitDepth for color type $colorType")
      val bpp = channelsOf(colorType)
      if (colorType == 3) require(palette != null, "palette PNG without PLTE")
      // raw-stream geometry: bits per pixel, bytes per scanline (sub-byte
      // depths pack MSB-first; rows pad to a byte boundary), and the
      // byte-level filter delta (PNG filters always operate on BYTES — for
      // sub-byte depths the "previous pixel" is the previous byte)
      val bitsPP = bitDepth * bpp
      val filterDelta = math.max(1, bitsPP / 8)
      def rowBytes(pw: Int): Int = (pw * bitsPP + 7) / 8
      val stride = w * bpp
      require(h.toLong * (1 + stride) <= Int.MaxValue, "PNG dimensions overflow")
      // Adam7 sub-image geometry: (xStart, yStart, xStep, yStep) per pass;
      // non-interlaced decodes as the single full-geometry "pass"
      val passes: Seq[(Int, Int, Int, Int)] =
        if (interlace == 0) Seq((0, 0, 1, 1))
        else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
        val (x0, y0, xs, ys) = p
        (math.max(0, (w - x0 + xs - 1) / xs), math.max(0, (h - y0 + ys - 1) / ys))
      }
      val totalRaw = passes.map { p =>
        val (pw, ph) = passDims(p)
        if (pw == 0 || ph == 0) 0L else ph.toLong * (1 + rowBytes(pw))
      }.sum
      require(totalRaw <= Int.MaxValue, "PNG dimensions overflow")
      // plausibility: zlib tops out near 1032:1, so declared dimensions
      // demanding more inflated bytes than the IDAT stream could ever
      // yield are corruption — refuse before allocating for garbage
      require(totalRaw <= 1100L * idat.size + 1024,
        s"corrupt PNG: $totalRaw pixel-stream bytes " +
          s"declared for ${idat.size} compressed bytes")
      val raw = new Array[Byte](totalRaw.toInt)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      try {
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          require(n > 0 || inf.finished(), "stalled PNG inflate (corrupt IDAT)")
          off += n
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"undecodable PNG stream: $e")
      } finally inf.end()
      require(off == raw.length,
        s"PNG pixel stream short: $off of ${raw.length} bytes")
      // unfilter each pass's scanlines (filters reference the PASS's own
      // previous row/pixel, never the full image), then scatter the pass's
      // pixels onto the image grid
      val px = new Array[Byte](h * stride)
      var rawOff = 0
      passes.foreach { case pass @ (x0, y0, xs, ys) =>
        val (pw, ph) = passDims(pass)
        if (pw > 0 && ph > 0) {
          val pRow = rowBytes(pw)
          val pp = new Array[Byte](ph * pRow)
          var y = 0
          while (y < ph) {
            val f = raw(rawOff + y * (1 + pRow)) & 0xff
            var x = 0
            while (x < pRow) {
              val cur = raw(rawOff + y * (1 + pRow) + 1 + x) & 0xff
              val left = if (x >= filterDelta) pp(y * pRow + x - filterDelta) & 0xff else 0
              val up = if (y > 0) pp((y - 1) * pRow + x) & 0xff else 0
              val ul = if (x >= filterDelta && y > 0) pp((y - 1) * pRow + x - filterDelta) & 0xff else 0
              val v = f match {
                case 0 => cur
                case 1 => cur + left
                case 2 => cur + up
                case 3 => cur + ((left + up) >> 1)
                case 4 => cur + paeth(left, up, ul)
                case other =>
                  throw new IllegalArgumentException(s"bad PNG filter $other")
              }
              pp(y * pRow + x) = (v & 0xff).toByte
              x += 1
            }
            y += 1
          }
          // expand the pass's raw samples to 8 bits per channel: 16-bit
          // takes the high byte (big-endian per spec), sub-byte unpacks
          // MSB-first — gray samples rescale to [0,255] (×255/(2^d−1)),
          // palette INDICES stay unscaled (they dereference, not display)
          val pStride = pw * bpp
          val pp8 =
            if (bitDepth == 8) pp
            else {
              val e = new Array[Byte](ph * pStride)
              val dmax = (1 << bitDepth) - 1
              var y2 = 0
              while (y2 < ph) {
                var s = 0
                while (s < pStride) {
                  val v8 =
                    if (bitDepth == 16) pp(y2 * pRow + 2 * s) & 0xff
                    else {
                      val bitOff = s * bitDepth
                      val shift = 8 - bitDepth - (bitOff & 7)
                      val v = (pp(y2 * pRow + (bitOff >> 3)) >> shift) & dmax
                      if (colorType == 3) v else v * 255 / dmax
                    }
                  e(y2 * pStride + s) = v8.toByte
                  s += 1
                }
                y2 += 1
              }
              e
            }
          var r = 0
          while (r < ph) {
            var c = 0
            while (c < pw) {
              val dst = ((y0 + r * ys) * w + (x0 + c * xs)) * bpp
              System.arraycopy(pp8, (r * pw + c) * bpp, px, dst, bpp)
              c += 1
            }
            r += 1
          }
          rawOff += ph * (1 + pRow)
        }
      }
      // expand to RGB (alpha drops; gray replicates; palette dereferences)
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        colorType match {
          case 0 | 4 =>
            val g = px(p * bpp)
            rgb(p * 3) = g; rgb(p * 3 + 1) = g; rgb(p * 3 + 2) = g
          case 2 | 6 =>
            rgb(p * 3) = px(p * bpp); rgb(p * 3 + 1) = px(p * bpp + 1)
            rgb(p * 3 + 2) = px(p * bpp + 2)
          case 3 =>
            val idx = (px(p) & 0xff) * 3
            require(idx + 2 < palette.length, s"palette index ${px(p) & 0xff} out of range")
            rgb(p * 3) = palette(idx); rgb(p * 3 + 1) = palette(idx + 1)
            rgb(p * 3 + 2) = palette(idx + 2)
        }
        p += 1
      }
      (w, h, rgb)
    }

    /** Encode PCM mono/stereo samples as a RIFF/WAVE file — the writer
      * side of [[decodeWav]]. Input samples are ALWAYS 16-bit; `bits`
      * selects the on-wire carrier: integer PCM 8 (unsigned, top byte),
      * 16, 24, 32 (left-shifted — exact round-trip), or IEEE float 32/64
      * (`float32 = true`/`bits = 64`, scaled v/32768 — exact round-trip,
      * the scale is a power of two inside float precision). */
    def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short],
        bits: Int = 16, float32: Boolean = false): Array[Byte] = {
      val isFloat = float32 || bits == 64
      require(if (isFloat) bits == 32 || bits == 64
        else Set(8, 16, 24, 32)(bits), s"unsupported WAV carrier: $bits-bit float=$isFloat")
      val bytesPer = bits / 8
      val dataSize = samples.length * bytesPer
      val out = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16)
        .putShort(if (isFloat) 3 else 1) // PCM / IEEE float
        .putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * bytesPer)
        .putShort((channels * bytesPer).toShort)
        .putShort(bits.toShort)
      out.put("data".getBytes).putInt(dataSize)
      samples.foreach { s =>
        if (isFloat && bits == 32) out.putFloat(s / 32768.0f)
        else if (isFloat) out.putDouble(s / 32768.0)
        else bits match {
          case 8 => out.put((((s: Int) >> 8) + 128).toByte)
          case 16 => out.putShort(s)
          case 24 =>
            val v = (s: Int) << 8
            out.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
              .put(((v >> 16) & 0xff).toByte)
          case 32 => out.putInt((s: Int) << 16)
        }
      }
      out.array()
    }

    /** Decode a RIFF/WAVE payload into (sampleRate, channels, samples) —
      * 16-bit normalized. Integer PCM at 8 (unsigned), 16, 24, 32 bits and
      * IEEE float at 32/64 bits all decode (8 shifts up; 24/32 keep the
      * top 16 bits; float clamps to [−1, 1] and scales by 32768). Walks
      * the chunk list, so extra chunks (LIST, fact) parse fine, and a
      * data chunk BEFORE fmt decodes correctly (bytes are interpreted
      * only after both are known). */
    def decodeWav(b: Array[Byte]): (Int, Int, Array[Short]) = {
      require(b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
        "not a RIFF/WAVE")
      var i = 12
      var rate = -1; var channels = -1; var fmtCode = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (i + 8 <= b.length && (rate < 0 || dataOff < 0)) {
        val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = i32le(b, i + 4)
        // a corrupt negative size would walk the chunk cursor BACKWARDS —
        // an infinite loop, not just a bad parse
        require(size >= 0, s"negative RIFF chunk size $size")
        id match {
          case "fmt " =>
            fmtCode = u16le(b, i + 8)
            require(fmtCode == 1 || fmtCode == 3,
              s"only PCM or IEEE-float WAV (format $fmtCode)")
            channels = u16le(b, i + 10)
            rate = i32le(b, i + 12)
            bits = u16le(b, i + 22)
          case "data" =>
            dataOff = i + 8; dataLen = size
          case _ => () // skip unknown chunks
        }
        i += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(rate > 0 && dataOff >= 0, "missing fmt/data chunk")
      require(dataOff + dataLen <= b.length, "WAV data chunk exceeds payload")
      val legal = if (fmtCode == 3) Set(32, 64) else Set(8, 16, 24, 32)
      require(legal(bits), s"unsupported WAV depth: $bits-bit format $fmtCode")
      val bytesPer = bits / 8
      val n = dataLen / bytesPer
      val samples = new Array[Short](n)
      var k = 0
      while (k < n) {
        val o = dataOff + k * bytesPer
        samples(k) =
          if (fmtCode == 3) {
            val f =
              if (bits == 32) java.lang.Float.intBitsToFloat(i32le(b, o)).toDouble
              else java.lang.Double.longBitsToDouble(
                (i32le(b, o + 4).toLong << 32) | (i32le(b, o).toLong & 0xffffffffL))
            math.max(-32768, math.min(32767,
              math.round(math.max(-1.0, math.min(1.0, f)) * 32768))).toShort
          } else bits match {
            case 8 => (((b(o) & 0xff) - 128) << 8).toShort
            case 16 => u16le(b, o).toShort
            case 24 =>
              // sign-extend the 24-bit sample, keep the top 16 bits
              (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
                (b(o + 2) << 16)) >> 8).toShort
            case 32 => (i32le(b, o) >> 16).toShort
          }
        k += 1
      }
      (rate, channels, samples)
    }

    /** REAL decode: sniff the payload's magic and decode BMP/PPM pixels or
      * WAV samples into [[MediaFeatures]] — image width/height are the
      * decoded dimensions and the feature vector carries mean R/G/B plus a
      * pixel checksum; audio maps (sampleRate, channels, nSamples) onto
      * (width, height, n_frames) with mean/RMS features. Payloads in no
      * known format (or corrupt) fall back to [[decodeStub]], so a mixed
      * corpus decodes what it can and still flows. */
    def decode(r: MediaRecord): MediaFeatures =
      try {
        val b = r.payload
        if (b.length > 2 && b(0) == 'B' && b(1) == 'M') {
          val (w, h, rgb) = decodeBmp(b); imageFeatures(r, w, h, rgb)
        } else if (b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
            b(2) == 'N' && b(3) == 'G') {
          val (w, h, rgb) = decodePng(b); imageFeatures(r, w, h, rgb)
        } else if (b.length > 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
          val (w, h, rgb) = JpegCodec.decode(b); imageFeatures(r, w, h, rgb)
        } else if (b.length > 2 && b(0) == 'P' && b(1) == '6') {
          val (w, h, rgb) = decodePpm(b); imageFeatures(r, w, h, rgb)
        } else if (b.length > 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
          val (rate, channels, samples) = decodeWav(b)
          var sum = 0.0; var sq = 0.0
          var i = 0
          while (i < samples.length) {
            val v = samples(i) / 32768.0; sum += v; sq += v * v; i += 1
          }
          val n = math.max(1, samples.length)
          MediaFeatures(r.doc_id, r.media_type, r.byte_len,
            width = rate, height = channels, n_frames = samples.length,
            feature = Array(sum / n, math.sqrt(sq / n), samples.length.toDouble,
              rate.toDouble, channels.toDouble, 0.0, 0.0, 0.0))
        } else decodeStub(r)
      } catch {
        // refusals are IllegalArgumentException, but a CORRUPT payload can
        // also surface as index/buffer/inflate errors from header
        // arithmetic — a mixed 100 TB corpus must degrade to the stub for
        // every malformed blob, never kill the job
        case scala.util.control.NonFatal(_) => decodeStub(r)
      }

    private def imageFeatures(r: MediaRecord, w: Int, h: Int,
        rgb: Array[Byte]): MediaFeatures = {
      var sr = 0L; var sg = 0L; var sb = 0L; var checksum = 0L
      var i = 0
      while (i < rgb.length) {
        val rv = rgb(i) & 0xff; val gv = rgb(i + 1) & 0xff; val bv = rgb(i + 2) & 0xff
        sr += rv; sg += gv; sb += bv
        checksum += rv + 2L * gv + 3L * bv
        i += 3
      }
      val n = math.max(1, w * h)
      MediaFeatures(r.doc_id, r.media_type, r.byte_len, w, h, n_frames = 1,
        feature = Array(sr.toDouble / n / 255.0, sg.toDouble / n / 255.0,
          sb.toDouble / n / 255.0, checksum.toDouble, w.toDouble, h.toDouble,
          0.0, 0.0))
    }

    /** STUB decode: deterministic pseudo-features derived from the payload
      * bytes. A real implementation would decode pixels/samples here; the
      * signature (bytes in, fixed-width features out, executed per partition
      * on executors) is exactly what a production decoder needs. */
    def decodeStub(r: MediaRecord): MediaFeatures = {
      var h = 1125899906842597L // deterministic FNV-ish fold over the payload
      var i = 0
      while (i < r.payload.length) { h = 31 * h + (r.payload(i) & 0xff); i += 1 }
      val width = 64 + (Math.floorMod(h, 16L) * 32L).toInt
      val height = 64 + (Math.floorMod(h >>> 8, 9L) * 32L).toInt
      val feature = Array.tabulate(8) { d =>
        val hd = h ^ (0x9e3779b97f4a7c15L * (d + 1))
        (Math.floorMod(hd, 2000L) - 1000L) / 1000.0
      }
      val frames = if (r.media_type == "video")
        1 + Math.floorMod(h >>> 16, 24L).toInt else 1
      MediaFeatures(r.doc_id, r.media_type, r.byte_len, width, height,
        n_frames = frames, feature)
    }

    /** STUB resize: a real implementation re-decodes at the target
      * resolution; the stub rescales the feature vector by the area ratio
      * (deterministic, plan shape identical). */
    def resizeStub(f: MediaFeatures, targetW: Int, targetH: Int): MediaFeatures = {
      val ratio = (targetW.toDouble * targetH) / (f.width.toDouble * f.height)
      f.copy(width = targetW, height = targetH,
        feature = f.feature.map(_ * ratio))
    }
  }

  /** Wrap a text corpus as fake media payloads (binary column + metadata) —
    * stands in for reading real image bytes; the schema and plan shape are
    * what a real multimodal table looks like. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      length(col(textCol).cast("binary")).cast("long").as("byte_len"))

  /** Decode/feature-extract over executor-side partitions (typed
    * mapPartitions — the Scala analogue of mapInPandas batch UDFs). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(MediaCodec.decode))
  }

  /** Resize every decoded record to a target resolution (executor-side,
    * same typed-batch shape as the decode). */
  def resize(media: DataFrame, targetW: Int, targetH: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    extractFeatures(media).map(MediaCodec.resizeStub(_, targetW, targetH))
  }

  /** FRAME SAMPLING: explode each video into every `step`-th frame index —
    * fully declarative (sequence + explode, no UDF), so Catalyst plans and
    * codegens it; images/audio pass through as frame 0. The real decoder
    * would fetch the sampled frames' bytes in the downstream decode. */
  def frameSample(media: DataFrame, step: Int): DataFrame = {
    require(step > 0, s"frame-sample step must be positive, got $step")
    val spark = media.sparkSession
    import spark.implicits._
    val feats = extractFeatures(media).toDF()
    feats.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(step))))
      .select(col("doc_id"), col("media_type"), col("frame_idx"), col("n_frames"))
  }

  /** Per-type feature summary (what a curation pipeline aggregates). */
  def featureSummary(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    extractFeatures(media)
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n"),
        sum($"byte_len").as("total_bytes"),
        max($"width").as("max_width"),
        max($"height").as("max_height"))
      .orderBy($"media_type")
  }
}
