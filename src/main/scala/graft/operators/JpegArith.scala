package graft.operators

/** ITU-T T.81 Annex D arithmetic entropy coder (the adaptive binary
  * "QM-coder") — the entropy layer behind arithmetic-coded JPEGs,
  * sequential (SOF9) and progressive (SOF10),
  * implemented from the spec's flowcharts: CODELPS/CODEMPS with
  * conditional exchange (D.1.3), renormalization with X'FF' bit stuffing
  * (D.1.5-D.1.6), FLUSH (D.1.8), and the decoder's DECODE/BYTEIN mirror
  * (D.2). The probability state machine is Table D.3 (public ITU spec
  * data, like the Annex K huffman tables [[JpegCodec]] already ships).
  *
  * Validation note: nothing in this container decodes arithmetic JPEG
  * (the JDK's ImageIO reader refuses SOF9), so conformance rests on the
  * spec flowcharts plus two self-checks stronger than a bare round-trip:
  * JpegArithPropSpec fuzzes the raw coder pair over random decision
  * streams with shared adaptive contexts (any register misalignment,
  * carry bug, or stuffing slip corrupts the stream within a few bytes),
  * and JpegCodecSpec pins that an arithmetic decode is PIXEL-IDENTICAL
  * to the huffman decode of the same quantized coefficients — entropy
  * layers are lossless, so any divergence is a bug.
  *
  * A context ("statistics bin") is one Int packed `(stateIndex << 1) |
  * mps`, held in caller-owned arrays so the Annex F statistics model can
  * address them by computed offsets.
  */
private[operators] object JpegArith {

  // Table D.3, column-split: Qe estimate, next state after an MPS, next
  // state after an LPS, and whether an LPS at this state flips the MPS
  // sense. 113 states; state 113 (the fixed .5 bin used for AC signs)
  // is modeled by FixedBin below, which never adapts.
  private[operators] val Qe: Array[Int] = Array(
    0x5A1D, 0x2586, 0x1114, 0x080B, 0x03D8, 0x01DA, 0x00E5, 0x006F,
    0x0036, 0x001A, 0x000D, 0x0006, 0x0003, 0x0001, 0x5A7F, 0x3F25,
    0x2CF2, 0x207C, 0x17B9, 0x1182, 0x0CEF, 0x09A1, 0x072F, 0x055C,
    0x0406, 0x0303, 0x0240, 0x01B1, 0x0144, 0x00F5, 0x00B7, 0x008A,
    0x0068, 0x004E, 0x003B, 0x002C, 0x5AE1, 0x484C, 0x3A0D, 0x2EF1,
    0x261F, 0x1F33, 0x19A8, 0x1518, 0x1177, 0x0E74, 0x0BFB, 0x09F8,
    0x0861, 0x0706, 0x05CD, 0x04DE, 0x040F, 0x0363, 0x02D4, 0x025C,
    0x01F8, 0x01A4, 0x0160, 0x0125, 0x00F6, 0x00CB, 0x00AB, 0x008F,
    0x5B12, 0x4D04, 0x412C, 0x37D8, 0x2FE8, 0x293C, 0x2379, 0x1EDF,
    0x1AA9, 0x174E, 0x1424, 0x119C, 0x0F6B, 0x0D51, 0x0BB6, 0x0A40,
    0x5832, 0x4D1C, 0x438E, 0x3BDD, 0x34EE, 0x2EAE, 0x299A, 0x2516,
    0x5570, 0x4CA9, 0x44D9, 0x3E22, 0x3824, 0x32B4, 0x2E17, 0x56A8,
    0x4F46, 0x47E5, 0x41CF, 0x3C3D, 0x375E, 0x5231, 0x4C0F, 0x4639,
    0x415E, 0x5627, 0x50E7, 0x4B85, 0x5597, 0x504F, 0x5A10, 0x5522,
    0x59EB)
  private[operators] val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 9, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 32,
    65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 77, 78, 79, 48,
    81, 82, 83, 84, 85, 86, 87, 71, 89, 90, 91, 92, 93, 94, 86, 96,
    97, 98, 99, 100, 93, 102, 103, 104, 99, 106, 107, 103, 109, 107,
    111, 109, 111)
  private[operators] val Nlps: Array[Int] = Array(
    1, 14, 16, 18, 20, 23, 25, 28, 30, 33, 35, 9, 10, 12, 15, 36,
    38, 39, 40, 42, 43, 45, 46, 48, 49, 51, 52, 54, 56, 57, 59, 60,
    62, 63, 32, 33, 37, 64, 65, 67, 68, 69, 70, 72, 73, 74, 75, 77,
    78, 79, 48, 50, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 61, 61,
    65, 80, 81, 82, 83, 84, 86, 87, 87, 72, 72, 74, 74, 75, 77, 77,
    80, 88, 89, 90, 91, 92, 93, 86, 88, 95, 96, 97, 99, 99, 93, 95,
    101, 102, 103, 104, 99, 105, 106, 107, 103, 105, 108, 109, 110, 111,
    110, 112, 112)
  private[operators] val Switch: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0,
    1)

  /** The non-adaptive equiprobable context (AC sign coding, F.1.4.3.1):
    * state 113 by convention — Qe = 0x5A1D with estimation frozen. */
  private[operators] val FixedBin = 113
  @inline private def qeOf(i: Int): Int = if (i == FixedBin) 0x5A1D else Qe(i)

  /** Annex D.1 encoder. Feed decisions with [[encode]]; [[finish]] runs
    * FLUSH and returns the entropy bytes (X'FF' bytes are bit-stuffed, so
    * the stream never forms a marker). */
  final class Encoder {
    private var a: Int = 0x10000
    private var c: Long = 0L
    private var ct: Int = 11
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Int]

    /** Code one decision in the caller-owned context `bins(bin)`. */
    def encode(bins: Array[Int], bin: Int, bit: Int): Unit = {
      val st = bins(bin)
      val i = st >>> 1
      val mps = st & 1
      val qe = qeOf(i)
      a -= qe
      if (bit == mps) { // CODEMPS: MPS takes the bottom subinterval
        if ((a & 0x8000) == 0) {
          if (a < qe) { c += a; a = qe } // conditional exchange
          if (i != FixedBin) bins(bin) = (Nmps(i) << 1) | mps
          renorm()
        }
      } else { // CODELPS: LPS takes the top subinterval (base moves by A)
        if (a < qe) () // conditional exchange: LPS keeps the bottom
        else { c += a; a = qe }
        if (i != FixedBin)
          bins(bin) = (Nlps(i) << 1) | (if (Switch(i) == 1) 1 - mps else mps)
        renorm()
      }
    }

    private def renorm(): Unit = {
      do {
        a <<= 1
        c <<= 1
        ct -= 1
        if (ct == 0) byteOut()
      } while ((a & 0x8000) == 0)
    }

    private def byteOut(): Unit = {
      val t = (c >>> 19).toInt
      c &= 0x7FFFF
      if (t > 0xFF) {
        // Carry into the last written byte. It can never be X'FF' already:
        // the group AFTER an X'FF' is 7 bits wide, and its stuffed zero
        // high bit absorbs any carry internally (t stays <= X'8F' there —
        // exactly why the decoder's marker test is "> X'8F'").
        require(buf.nonEmpty, "arithmetic carry before any output byte")
        require(buf.last != 0xFF, "carry across a stuffed boundary")
        buf(buf.length - 1) += 1
        if (buf.last == 0xFF) {
          // the carry just CREATED an X'FF' (X'FE' + 1): the current group
          // was built 8 bits wide, but the stream grammar now demands a
          // stuffed 7-bit byte here. Re-group on the spot: emit the high 7
          // bits (MSB zero by construction) and return the low bit to the
          // pipeline at the window boundary — the decoder parses the
          // re-grouped bytes back into the identical fraction.
          buf += ((t & 0xFF) >>> 1)
          c |= (t & 1L) << 19
          ct = 7
        } else {
          buf += (t & 0xFF)
          ct = if ((t & 0xFF) == 0xFF) 7 else 8
        }
      } else {
        buf += t
        ct = if (t == 0xFF) 7 else 8 // bit-stuff after X'FF'
      }
    }

    /** Annex D.1.8 FLUSH: set C to the smallest value inside the final
      * interval that maximizes trailing zeros, push the remaining bytes
      * out, and drop trailing X'00's (the decoder's marker handling
      * regenerates them as needed). */
    def finish(): Array[Byte] = {
      val t = (c + a - 1) & 0xFFFF0000L // CLEARBITS
      c = if (t < c) t + 0x8000 else t
      c <<= ct
      byteOut()
      c <<= ct
      byteOut()
      // strip trailing zeros — EXCEPT a zero that is the stuffed byte of
      // a preceding X'FF' (the decoder must still consume the X'FF' as
      // data; without its follower it would read as a marker and the
      // eight 1-bits would be lost)
      while (buf.nonEmpty && buf.last == 0 &&
          (buf.length == 1 || buf(buf.length - 2) != 0xFF))
        buf.remove(buf.length - 1)
      buf.map(_.toByte).toArray
    }
  }

  /** Annex D.2 decoder over `data(start until data.length)`; stops
    * consuming at any marker (X'FF' followed by anything above X'8F') and
    * feeds ZERO bits from there on — deliberately diverging from D.2.7's
    * C + X'FF00' (1-bit) convention, matching the libjpeg convention the
    * encoder's trailing-0x00 strip depends on (see byteIn). `pos` after
    * decoding is the offset of the terminating marker's X'FF' (or the
    * data end). */
  final class Decoder(data: Array[Byte], start: Int) {
    private var np: Int = start // next unconsumed byte
    private var prevFF: Boolean = false
    private var ended: Boolean = false
    private var a: Int = 0
    private var c: Long = 0L
    private var ct: Int = 0

    locally { // INITDEC: shift the first 16 fraction bits into chigh
      // through the SAME staged-byte pipeline renormalization uses —
      // X'FF' stuffing (a 7-bit byte) and short/empty streams then need
      // no special casing, and chigh lands bit-exactly on the window the
      // encoder's first CODE subdivided.
      var k = 0
      while (k < 16) {
        if (ct == 0) byteIn()
        c <<= 1
        ct -= 1
        k += 1
      }
      a = 0x10000
    }

    /** Offset of the first byte the decoder did not consume (the
      * terminating marker's X'FF' once a marker stopped input). */
    def pos: Int = np

    /** D.2.7 with ZERO-feeding at markers/end-of-data: the encoder's
      * FLUSH strips trailing X'00' bytes, so the decoder regenerates the
      * fraction's tail as zeros once it runs into the terminating marker
      * (or the end of the segment). A byte after X'FF' carries only 7
      * fraction bits (the stuffed zero high bit), tracked by `ct`. */
    private def byteIn(): Unit = {
      // marker test BEFORE consuming: the next byte being X'FF' followed
      // by anything above X'8F' (or by nothing) IS the terminating marker
      // — its bits are never entropy data. An X'FF' followed by <= X'8F'
      // is data (its follower carries the stuffed zero high bit).
      if (ended || np >= data.length ||
          ((data(np) & 0xff) == 0xFF &&
            (np + 1 >= data.length || (data(np + 1) & 0xff) > 0x8F))) {
        ended = true
        ct = 8 // feed zero bits from here on
      } else {
        val b = data(np) & 0xff
        np += 1
        if (prevFF) { c += b.toLong << 9; ct = 7 }
        else { c += b.toLong << 8; ct = 8 }
        prevFF = b == 0xFF
      }
    }

    /** Decode one decision from the caller-owned context `bins(bin)`. */
    def decode(bins: Array[Int], bin: Int): Int = {
      val st = bins(bin)
      val i = st >>> 1
      val mps = st & 1
      val qe = qeOf(i)
      a -= qe
      if (((c >>> 16) & 0xFFFF) < a) {
        if ((a & 0x8000) != 0) mps
        else { // MPS_EXCHANGE
          val d =
            if (a < qe) {
              if (i != FixedBin) bins(bin) =
                (Nlps(i) << 1) | (if (Switch(i) == 1) 1 - mps else mps)
              1 - mps
            } else {
              if (i != FixedBin) bins(bin) = (Nmps(i) << 1) | mps
              mps
            }
          renorm()
          d
        }
      } else { // LPS_EXCHANGE
        c -= a.toLong << 16
        val d =
          if (a < qe) {
            if (i != FixedBin) bins(bin) = (Nmps(i) << 1) | mps
            mps
          } else {
            if (i != FixedBin) bins(bin) =
              (Nlps(i) << 1) | (if (Switch(i) == 1) 1 - mps else mps)
            1 - mps
          }
        a = qe
        renorm()
        d
      }
    }

    private def renorm(): Unit = {
      do {
        if (ct == 0) byteIn()
        a <<= 1
        c <<= 1
        ct -= 1
      } while ((a & 0x8000) == 0)
      c &= 0xFFFFFFFFL
    }
  }

  /** A fresh context array, every bin at state 0 with MPS = 0. */
  def freshBins(n: Int): Array[Int] = new Array[Int](n)
}
