package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Fuzz for the T.81 Annex D arithmetic coder pair in isolation: random
  * decision streams over random context structures must round-trip
  * exactly. This is the strongest check available in-container (nothing
  * here decodes arithmetic JPEG independently): any register
  * misalignment, carry bug, stuffing slip, or Table D.3 transition
  * mismatch between the mirrored encoder/decoder procedures corrupts the
  * decoded decisions within a few bytes, across thousands of cases. */
object JpegArithPropSpec extends Properties("JpegArith") {

  private val streamGen: Gen[(Int, Int, List[Int], List[Int])] = for {
    nBins <- Gen.choose(1, 8)
    n <- Gen.choose(0, 600)
    // biased bits drive the estimator deep into the MPS states (small Qe,
    // long renorm gaps); uniform bits churn the LPS/switch paths
    bias <- Gen.choose(1, 9)
    bits <- Gen.listOfN(n, Gen.frequency(bias -> 0, (10 - bias) -> 1))
    bins <- Gen.listOfN(n, Gen.choose(0, nBins - 1))
  } yield (nBins, n, bits, bins)

  property("random decision streams round-trip through shared adaptive " +
      "contexts (encoder and decoder estimators stay in lockstep)") =
    Prop.forAll(streamGen) { case (nBins, _, bits0, binSeq0) =>
      // shrinking can unbalance the two lists — truncate to the zip
      val pairs = bits0.zip(binSeq0)
      val encBins = JpegArith.freshBins(nBins)
      val enc = new JpegArith.Encoder
      pairs.foreach { case (b, s) => enc.encode(encBins, s, b) }
      val bytes = enc.finish()
      val decBins = JpegArith.freshBins(nBins)
      val dec = new JpegArith.Decoder(bytes, 0)
      val out = pairs.map { case (_, s) => dec.decode(decBins, s) }
      out == pairs.map(_._1) && java.util.Arrays.equals(encBins, decBins)
    }

  property("the fixed equiprobable bin codes signs without adapting") =
    Prop.forAll(Gen.listOfN(300, Gen.oneOf(0, 1))) { bits =>
      val bins = JpegArith.freshBins(1)
      bins(0) = JpegArith.FixedBin << 1
      val enc = new JpegArith.Encoder
      bits.foreach(b => enc.encode(bins, 0, b))
      val bytes = enc.finish()
      val stateUnchanged = bins(0) == (JpegArith.FixedBin << 1)
      val dbins = JpegArith.freshBins(1)
      dbins(0) = JpegArith.FixedBin << 1
      val dec = new JpegArith.Decoder(bytes, 0)
      val out = bits.map(_ => dec.decode(dbins, 0))
      // ~1 bit/decision: the fixed bin compresses nothing (equiprobable)
      stateUnchanged && out == bits && bytes.length >= bits.length / 8
    }

  property("the entropy stream never forms a marker: every 0xFF is " +
      "followed by a byte <= 0x8F (stuffed zero bit, possibly plus a " +
      "carry into it — exactly the spec's > 0x8F marker boundary) or " +
      "ends the stream") =
    Prop.forAll(streamGen) { case (nBins, _, bits, binSeq) =>
      val pairs = bits.zip(binSeq)
      val bins = JpegArith.freshBins(nBins)
      val enc = new JpegArith.Encoder
      pairs.foreach { case (b, s) => enc.encode(bins, s, b) }
      val bytes = enc.finish()
      bytes.indices.forall { i =>
        (bytes(i) & 0xff) != 0xFF || i == bytes.length - 1 ||
          (bytes(i + 1) & 0xff) <= 0x8F
      }
    }
}
