package graft.iceberg

import org.scalacheck.{Gen, Prop, Properties}

/** Property coverage of the DV codec: for ANY position set, the
  * library-serialized bytes decode identically through the library reader
  * and the from-scratch standalone parser — across container-kind
  * boundaries (array ↔ bitmap ↔ run) and high-key splits. */
object DeletionVectorsPropSpec extends Properties("DeletionVectors") {

  // mixes of sparse points, dense runs, and >2^32 keys — the shapes that
  // pick different roaring container kinds
  private val positionsGen: Gen[Array[Long]] = for {
    sparse <- Gen.listOf(Gen.chooseNum(0L, 1L << 40))
    runStart <- Gen.chooseNum(0L, 1L << 20)
    runLen <- Gen.chooseNum(0, 9000)
    denseBase <- Gen.chooseNum(0L, 1L << 34)
    denseN <- Gen.chooseNum(0, 6000)
    stride <- Gen.oneOf(1L, 2L, 3L)
  } yield (sparse ++
    (runStart until runStart + runLen) ++
    (0 until denseN).map(i => denseBase + stride * i)).distinct.sorted.toArray

  property("lib round trip == standalone decode") = Prop.forAll(positionsGen) { ps =>
    if (ps.isEmpty) Prop.passed
    else {
      val blob = DeletionVectors.frameBlob(DeletionVectors.serializePositions(ps))
      val lib = DeletionVectors.decodeBlob(blob)
      val standalone = DeletionVectors.decodePositionsStandalone(blob)
      Prop(lib.sameElements(ps)) :| "library decode drifted" &&
        Prop(standalone.sameElements(ps)) :| "standalone decode drifted"
    }
  }
}
