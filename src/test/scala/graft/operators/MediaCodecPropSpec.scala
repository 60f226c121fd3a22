package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Multimodal.MediaCodec

/** Round-trip fuzz for the pure-JVM PNG codec: for every supported color
  * type, random dimensions, and random pixel bytes,
  * `decodePng(encodePng(px)) == expected RGB expansion`. The encoder
  * cycles the scanline filter per row (y % 5), so any h ≥ 5 walks every
  * unfilter path (None/Sub/Up/Average/Paeth) against adversarial byte
  * patterns — a sign error in Paeth or a stride slip in Sub shows up as a
  * pixel mismatch, not a crash. */
object MediaCodecPropSpec extends Properties("PngCodec") {

  private val dims: Gen[(Int, Int)] =
    for { w <- Gen.choose(1, 17); h <- Gen.choose(1, 13) } yield (w, h)

  private def bytes(n: Int): Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))

  private def eq(a: Array[Byte], b: Array[Byte]): Boolean = a.sameElements(b)

  property("RGB (type 2) round-trips every pixel byte") =
    Prop.forAll(dims.flatMap { case (w, h) =>
      bytes(w * h * 3).map(px => (w, h, px))
    }) { case (w, h, px) =>
      val (dw, dh, out) = MediaCodec.decodePng(MediaCodec.encodePng(w, h, 2, px))
      dw == w && dh == h && eq(out, px)
    }

  property("grayscale (type 0) expands to (g,g,g)") =
    Prop.forAll(dims.flatMap { case (w, h) =>
      bytes(w * h).map(px => (w, h, px))
    }) { case (w, h, px) =>
      val (_, _, out) = MediaCodec.decodePng(MediaCodec.encodePng(w, h, 0, px))
      eq(out, px.flatMap(g => Array(g, g, g)))
    }

  property("gray+alpha (type 4) drops alpha, keeps gray") =
    Prop.forAll(dims.flatMap { case (w, h) =>
      bytes(w * h * 2).map(px => (w, h, px))
    }) { case (w, h, px) =>
      val (_, _, out) = MediaCodec.decodePng(MediaCodec.encodePng(w, h, 4, px))
      eq(out, Array.tabulate(w * h * 3)(i => px((i / 3) * 2)))
    }

  property("RGBA (type 6) drops alpha, keeps RGB") =
    Prop.forAll(dims.flatMap { case (w, h) =>
      bytes(w * h * 4).map(px => (w, h, px))
    }) { case (w, h, px) =>
      val (_, _, out) = MediaCodec.decodePng(MediaCodec.encodePng(w, h, 6, px))
      eq(out, Array.tabulate(w * h * 3)(i => px((i / 3) * 4 + i % 3)))
    }

  property("palette (type 3) dereferences PLTE for any index pattern") =
    Prop.forAll(for {
      (w, h) <- dims
      px <- bytes(w * h)
      pal <- bytes(256 * 3)
    } yield (w, h, px, pal)) { case (w, h, px, pal) =>
      val (_, _, out) =
        MediaCodec.decodePng(MediaCodec.encodePng(w, h, 3, px, pal))
      eq(out, px.flatMap { i0 =>
        val i = (i0 & 0xff) * 3
        Array(pal(i), pal(i + 1), pal(i + 2))
      })
    }
}
