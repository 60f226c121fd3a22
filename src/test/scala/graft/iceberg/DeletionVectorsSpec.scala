package graft.iceberg

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level round trips of the Iceberg v3 DV carrier: the library-backed
  * serializer against the from-scratch standalone decoder, across every
  * roaring container kind the portable format defines. */
class DeletionVectorsSpec extends AnyFunSuite {

  private def roundTrip(positions: Array[Long]): Unit = {
    val sorted = positions.distinct.sorted
    val vec = DeletionVectors.serializePositions(sorted)
    val blob = DeletionVectors.frameBlob(vec)
    assert(DeletionVectors.decodeBlob(blob).toSeq == sorted.toSeq,
      "library decode disagrees")
    assert(DeletionVectors.decodePositionsStandalone(blob).toSeq == sorted.toSeq,
      "standalone decode disagrees")
  }

  test("array containers: sparse positions round-trip") {
    roundTrip(Array(0L, 1L, 5L, 1000L, 65537L, 123456789L))
  }

  test("bitmap container: a dense 16-bit chunk (>4096 values)") {
    // 5000 even values inside one chunk -> bitmap container (not run-friendly)
    roundTrip(Array.tabulate(5000)(i => 2L * i))
  }

  test("run containers: a contiguous range survives runOptimize") {
    val positions = (100L to 9000L).toArray
    val vec = DeletionVectors.serializePositions(positions)
    // a 8901-value run must compress far below the 2-bytes-per-value array form
    assert(vec.length < 1000, s"run encoding missing: ${vec.length} bytes")
    roundTrip(positions)
  }

  test("positions above 2^32 span multiple high-32 keys") {
    roundTrip(Array(3L, (1L << 32) + 7L, (1L << 32) + 8L, (5L << 32) | 0xFFFFFFFFL))
  }

  test("mixed container kinds in one vector") {
    val runs = (0L until 5000L).toArray // run container in chunk 0
    val dense = Array.tabulate(5000)(i => (1L << 16) + 2L * i) // bitmap, chunk 1
    val sparse = Array(1L << 20, (1L << 20) + 5) // array container
    val high = Array((9L << 32) + 1, (9L << 32) + 3) // second key
    roundTrip(runs ++ dense ++ sparse ++ high)
  }

  test("golden bytes: the serialized form is pinned to the published spec") {
    // hand-derived from the published RoaringFormatSpec: positions {1,2,3}
    // under high-key 0 -> LE64 key count, LE32 key, then one 32-bit
    // portable bitmap with cookie 12346 (no runs — 3 array values beat a
    // run container), one container, descriptive header, offset header,
    // and the sorted u16 values
    val vec = DeletionVectors.serializePositions(Array(1L, 2L, 3L))
    val expect = Array[Int](
      0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, // LE64 one high key
      0x00, 0x00, 0x00, 0x00, // LE32 key 0
      0x3A, 0x30, 0x00, 0x00, // cookie 12346 (SERIAL_COOKIE_NO_RUNCONTAINER)
      0x01, 0x00, 0x00, 0x00, // one container
      0x00, 0x00, 0x02, 0x00, // key=0, cardinality-1=2
      0x10, 0x00, 0x00, 0x00, // offset of container 0: byte 16
      0x01, 0x00, 0x02, 0x00, 0x03, 0x00 // array container {1,2,3}
    ).map(_.toByte)
    assert(vec.toSeq == expect.toSeq,
      s"byte layout drifted: ${vec.map("%02X".format(_)).mkString(" ")}")
    // and the framed blob's trailer fields are exactly length+magic+crc
    val blob = DeletionVectors.frameBlob(vec)
    assert(blob.length == 4 + 4 + vec.length + 4)
    assert(java.nio.ByteBuffer.wrap(blob).getInt() == vec.length + 4)
  }

  test("scale: a 5M-position DV stays compact and decodes fast") {
    // 5M positions over 10 files' worth of one bitmap: dense ranges + spray
    val positions = (0L until 4000000L).toArray ++
      Array.tabulate(1000000)(i => 4000000L + 7L * i)
    val t0 = System.nanoTime()
    val vec = DeletionVectors.serializePositions(positions)
    val blob = DeletionVectors.frameBlob(vec)
    val encodeMs = (System.nanoTime() - t0) / 1e6
    // run container for the dense range + bitmaps for the spray: far below
    // the 40 MB a parquet carrier's 8-byte positions would weigh
    assert(vec.length < 2 * 1024 * 1024, s"DV too large: ${vec.length} bytes")
    val t1 = System.nanoTime()
    val decoded = DeletionVectors.decodeBlob(blob)
    val decodeMs = (System.nanoTime() - t1) / 1e6
    assert(decoded.length == positions.length)
    assert(decoded(0) == 0L && decoded.last == positions.last)
    assert(encodeMs < 5000 && decodeMs < 5000,
      s"DV codec too slow: encode ${encodeMs}ms decode ${decodeMs}ms")
  }

  test("corrupted bytes fail the CRC loudly") {
    val blob = DeletionVectors.frameBlob(
      DeletionVectors.serializePositions(Array(1L, 2L, 3L)))
    blob(blob.length - 6) = (blob(blob.length - 6) ^ 0x1).toByte // flip a vector bit
    intercept[IllegalArgumentException](DeletionVectors.decodeBlob(blob))
    intercept[IllegalArgumentException](
      DeletionVectors.decodePositionsStandalone(blob))
  }

  test("puffin file: write, locate via footer, decode, verify cardinality") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft_dv").toString
    val path = s"$dir/${DeletionVectors.puffinName("c1")}"
    val a = Array(1L, 2L, 100L)
    val b = (0L until 6000L).toArray
    val (blobs, fileLen) = DeletionVectors.writePuffin(path, conf,
      Seq(
        ("/w/t/data/f1.parquet", DeletionVectors.serializePositions(a), a.length.toLong),
        ("/w/t/data/f2.parquet", DeletionVectors.serializePositions(b), b.length.toLong)),
      snapshotId = 42L, sequenceNumber = 7L)
    assert(blobs.map(_.referencedDataFile) ==
      Seq("/w/t/data/f1.parquet", "/w/t/data/f2.parquet"))
    assert(blobs.head.offset == 4L) // first blob right after the header magic
    assert(new java.io.File(path).length() == fileLen)
    val read = DeletionVectors.readPuffin(path, conf)
    assert(read.map(_._1) == blobs)
    assert(read(0)._2.toSeq == a.toSeq)
    assert(read(1)._2.toSeq == b.toSeq)
    assert(read.forall(_._1.snapshotId == 42L))
    // manifest-style direct seek: content_offset/content_size alone suffice
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val direct = raw.slice(blobs(1).offset.toInt,
      (blobs(1).offset + blobs(1).length).toInt)
    assert(DeletionVectors.decodePositionsStandalone(direct).toSeq == b.toSeq)
  }
}
