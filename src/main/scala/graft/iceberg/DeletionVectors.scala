package graft.iceberg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.roaringbitmap.RoaringBitmap

/** Iceberg v3 DELETION VECTORS: position deletes carried as 64-bit roaring
  * bitmaps inside Puffin files (public Iceberg v3 spec, "Deletion vectors"
  * + Puffin spec; the reference engine reads v1 tables only — ice.py:220 —
  * so this whole carrier is an extension beyond it).
  *
  * Layouts implemented here, all from the published specs:
  *  - Puffin file: `PFA1` magic, blobs at recorded offsets, then a footer
  *    of magic + UTF-8 JSON payload + LE32 payload size + 4 flag bytes +
  *    magic. Flags stay zero (uncompressed payload).
  *  - DV blob (`deletion-vector-v1`): BE32 length of (magic + vector),
  *    the magic bytes D1 D3 3D D3, the serialized vector, and a BE32
  *    CRC-32 of (magic + vector).
  *  - Vector: the "portable" 64-bit roaring layout — LE64 count of
  *    non-empty high-32-bit keys, then per ascending key a LE32 key
  *    followed by a standard 32-bit roaring bitmap in portable form.
  *
  * The 32-bit serialization goes through `org.roaringbitmap.RoaringBitmap`
  * (the format's reference implementation, already on Spark's classpath —
  * Spark itself ships it for shuffle tracking). The ORACLE side decodes
  * with [[decodePositionsStandalone]], a from-scratch parser of the
  * portable format (array/bitmap/run containers, both cookies) that shares
  * no code with the library — a write-with-lib / read-by-hand round trip
  * that proves the written bytes match the published spec, not just our
  * own reader.
  *
  * One DV describes the deleted positions of exactly ONE data file; one
  * puffin file carries the DVs of one commit (one blob per data file).
  * Scale shape: bitmaps build executor-side (the position shuffle is the
  * same O(deleted rows) the parquet carrier pays) and only the COMPRESSED
  * bitmap bytes land on the driver for the sequential puffin append.
  */
object DeletionVectors {

  val PuffinMagic: Array[Byte] = Puffin.Magic // "PFA1" — envelope shared via [[Puffin]]
  val DvMagic: Array[Byte] = Array(0xD1, 0xD3, 0x3D, 0xD3).map(_.toByte)
  val BlobType = "deletion-vector-v1"

  /** One DV blob's metadata, as recorded in the puffin footer AND (path,
    * offset, length, cardinality) in the manifest entry that registers it. */
  final case class DvBlob(
      referencedDataFile: String,
      offset: Long,
      length: Long,
      cardinality: Long,
      snapshotId: Long,
      sequenceNumber: Long)

  // ------------------------------------------------------------ serialize

  /** Sorted distinct positions → portable 64-bit roaring bytes. */
  def serializePositions(positions: Array[Long]): Array[Byte] = {
    require(positions.nonEmpty, "a deletion vector cannot be empty")
    // group by high-32 key, preserving ascending key order (input sorted)
    val byKey = scala.collection.mutable.LinkedHashMap.empty[Int, RoaringBitmap]
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      require(p >= 0, s"negative delete position $p")
      val bm = byKey.getOrElseUpdate((p >>> 32).toInt, new RoaringBitmap())
      bm.add(p.toInt) // low 32 bits, unsigned semantics
      i += 1
    }
    val out = new ByteArrayOutputStream()
    val le = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    le.putLong(byKey.size.toLong)
    out.write(le.array())
    val dos = new DataOutputStream(out)
    byKey.foreach { case (key, bm) =>
      val kb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      kb.putInt(key)
      out.write(kb.array())
      bm.runOptimize() // spec allows run containers; smallest representation
      bm.serialize(dos) // the lib's native format IS the portable spec
    }
    dos.flush()
    out.toByteArray
  }

  /** Portable 64-bit roaring bytes → ascending positions (library decode —
    * the scan path). */
  def deserializePositions(vec: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(vec).order(ByteOrder.LITTLE_ENDIAN)
    val nKeys = buf.getLong()
    require(nKeys >= 0 && nKeys <= Int.MaxValue, s"bad key count $nKeys")
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var k = 0L
    while (k < nKeys) {
      val key = buf.getInt().toLong & 0xFFFFFFFFL
      val bm = new RoaringBitmap()
      val in = new DataInputStream(new ByteArrayInputStream(
        vec, buf.position(), vec.length - buf.position()))
      bm.deserialize(in)
      buf.position(buf.position() + bm.serializedSizeInBytes())
      val it = bm.getIntIterator
      while (it.hasNext) out += (key << 32) | (it.next().toLong & 0xFFFFFFFFL)
      k += 1
    }
    out.result()
  }

  /** Frame a serialized vector as a `deletion-vector-v1` blob. */
  def frameBlob(vec: Array[Byte]): Array[Byte] = {
    val crc = new CRC32()
    crc.update(DvMagic)
    crc.update(vec)
    val out = ByteBuffer.allocate(4 + 4 + vec.length + 4)
    out.putInt(4 + vec.length) // length of magic + vector, big-endian
    out.put(DvMagic)
    out.put(vec)
    out.putInt(crc.getValue.toInt) // CRC-32, big-endian
    out.array()
  }

  /** Decode one framed blob back to positions, verifying magic + CRC. */
  def decodeBlob(blob: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(blob)
    val len = buf.getInt()
    require(len == blob.length - 8,
      s"DV blob length field $len does not match blob size ${blob.length}")
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, DvMagic),
      s"bad DV magic ${magic.map("%02X".format(_)).mkString(" ")}")
    val vec = new Array[Byte](len - 4)
    buf.get(vec)
    val stored = buf.getInt()
    val crc = new CRC32()
    crc.update(DvMagic)
    crc.update(vec)
    require(stored == crc.getValue.toInt,
      f"DV CRC mismatch: stored 0x$stored%08X computed 0x${crc.getValue.toInt}%08X")
    deserializePositions(vec)
  }

  // --------------------------------------------------------------- puffin

  private val mapper = new ObjectMapper()

  /** Write ONE puffin file holding one DV blob per `(referencedDataFile,
    * serializedVector, cardinality)`. Returns the recorded blobs (offsets/
    * lengths for the manifest) and the total file length. */
  def writePuffin(path: String, conf: Configuration,
      dvs: Seq[(String, Array[Byte], Long)],
      snapshotId: Long, sequenceNumber: Long,
      /** Executor-side writers pass true: a retried task re-creates the SAME
        * per-partition path, and only the attempt that returns is committed. */
      overwrite: Boolean = false): (Seq[DvBlob], Long) = {
    require(dvs.nonEmpty, "writePuffin needs at least one DV")
    def blobsFor(located: Seq[(Long, Long)]): Seq[DvBlob] =
      dvs.zip(located).map { case ((file, _, card), (off, len)) =>
        DvBlob(file, off, len, card, snapshotId, sequenceNumber)
      }
    val (located, fileLen, _) = Puffin.write(path, conf,
      dvs.map(d => frameBlob(d._2)),
      payloadFor = locs => footerPayload(blobsFor(locs)), overwrite)
    (blobsFor(located), fileLen)
  }

  private def footerPayload(blobs: Seq[DvBlob]): Array[Byte] = {
    val root = mapper.createObjectNode()
    val arr = root.withArray[ArrayNode]("blobs")
    blobs.foreach { b =>
      val n = mapper.createObjectNode()
      n.put("type", BlobType)
      n.withArray[ArrayNode]("fields") // DVs bind to a file, not a column
      n.put("snapshot-id", b.snapshotId)
      n.put("sequence-number", b.sequenceNumber)
      n.put("offset", b.offset)
      n.put("length", b.length)
      val props = mapper.createObjectNode()
      props.put("referenced-data-file", b.referencedDataFile)
      props.put("cardinality", b.cardinality.toString)
      n.set[ObjectNode]("properties", props)
      arr.add(n)
    }
    val props = mapper.createObjectNode()
    props.put("created-by", "graft")
    root.set[ObjectNode]("properties", props)
    root.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Copy a DV puffin with every blob's `referenced-data-file` property
    * passed through `re` — the relocation rewrite. Each blob KEEPS its own
    * snapshot-id/sequence-number (a consolidated or foreign puffin can mix
    * commits; stamping one lineage over all blobs would corrupt it); only
    * the referenced path and the recomputed offsets/lengths change.
    * Returns the rewritten blobs (target-path references, new locations)
    * and the new file length. */
  def rewritePuffinPaths(src: String, dst: String, conf: Configuration,
      re: String => String): (Seq[DvBlob], Long) = {
    val blobs = readPuffin(src, conf)
    require(blobs.nonEmpty,
      s"no deletion-vector blobs in puffin $src — nothing to rewrite")
    // the rebuild emits ONLY deletion-vector blobs: a foreign puffin mixing
    // in other blob types (spec-legal) would silently lose them — refuse
    val total = footerBlobTotal(src, conf)
    require(total == blobs.size,
      s"puffin $src holds $total blobs but only ${blobs.size} are " +
        "deletion-vector-v1 — rewriting would drop the others; copy such " +
        "mixed files with the engine that wrote them")
    def relocated(located: Seq[(Long, Long)]): Seq[DvBlob] =
      blobs.zip(located).map { case ((b, _), (off, len)) =>
        b.copy(referencedDataFile = re(b.referencedDataFile),
          offset = off, length = len)
      }
    val (located, fileLen, _) = Puffin.write(dst, conf,
      blobs.map { case (_, pos) => frameBlob(serializePositions(pos)) },
      payloadFor = locs => footerPayload(relocated(locs)))
    (relocated(located), fileLen)
  }

  /** Read a puffin file's DV blobs WITH their decoded positions, locating
    * blobs through the file's own footer (not manifest offsets — readers
    * of the manifest can also seek directly with content_offset/size). */
  def readPuffin(path: String, conf: Configuration): Seq[(DvBlob, Array[Long])] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val blobs = {
        val tail = new Array[Byte](12)
        in.readFully(len - 12, tail)
        val tb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
        val payloadSize = tb.getInt()
        val flags = tb.getInt()
        val magic = new Array[Byte](4)
        tb.get(magic)
        require(java.util.Arrays.equals(magic, PuffinMagic), s"not a puffin file: $path")
        val stored = new Array[Byte](payloadSize)
        in.readFully(len - 12 - payloadSize, stored)
        // spec flag bit 0: LZ4-frame-compressed footer payload (tolerated
        // on read; this writer emits uncompressed)
        parseFooter(if ((flags & 1) != 0) Puffin.lz4Decompress(stored) else stored)
      }
      blobs.map { b =>
        require(b.length > 0 && b.length <= Int.MaxValue,
          s"DV blob size out of range (${b.length} bytes) in $path")
        val bytes = new Array[Byte](b.length.toInt)
        in.readFully(b.offset, bytes)
        val positions = decodeBlob(bytes)
        require(positions.length.toLong == b.cardinality,
          s"DV cardinality mismatch for ${b.referencedDataFile}: footer says " +
            s"${b.cardinality}, bitmap holds ${positions.length}")
        (b, positions)
      }
    } finally in.close()
  }

  /** Decode ONE blob by direct seek — the manifest-driven read path
    * (content_offset/content_size_in_bytes, no footer parse). */
  def readBlobAt(path: String, conf: Configuration,
      offset: Long, length: Long): Array[Long] = {
    require(length > 0 && length <= Int.MaxValue,
      s"DV blob size out of range ($length bytes) in $path")
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      val bytes = new Array[Byte](length.toInt)
      in.readFully(offset, bytes)
      decodeBlob(bytes)
    } finally in.close()
  }

  /** Count of ALL blob entries in a puffin's footer, regardless of type. */
  private def footerBlobTotal(path: String, conf: Configuration): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val tb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tb.getInt()
      val flags = tb.getInt()
      val stored = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, stored)
      val payload = if ((flags & 1) != 0) Puffin.lz4Decompress(stored) else stored
      val blobs = mapper.readTree(payload).get("blobs")
      if (blobs == null || !blobs.isArray) 0 else blobs.size()
    } finally in.close()
  }

  private def parseFooter(payload: Array[Byte]): Seq[DvBlob] = {
    val root = mapper.readTree(payload)
    val blobs = root.get("blobs")
    require(blobs != null && blobs.isArray, "puffin footer without blobs array")
    (0 until blobs.size()).map(blobs.get).filter(
      _.get("type").asText() == BlobType).map { n =>
      // spec "Deletion vectors": DV blobs MUST NOT be compressed — a codec
      // here means a non-conformant writer; refuse rather than misdecode
      require(n.get("compression-codec") == null ||
        n.get("compression-codec").isNull,
        "deletion-vector-v1 blobs must not be compressed (puffin spec)")
      val props = n.get("properties")
      DvBlob(
        referencedDataFile = props.get("referenced-data-file").asText(),
        offset = n.get("offset").asLong(),
        length = n.get("length").asLong(),
        cardinality = props.get("cardinality").asText().toLong,
        snapshotId = Option(n.get("snapshot-id")).map(_.asLong()).getOrElse(-1L),
        sequenceNumber = Option(n.get("sequence-number")).map(_.asLong()).getOrElse(-1L))
    }
  }

  /** File-name convention for DV puffin files (the read side dispatches
    * parquet-vs-puffin on manifest `file_format`, never on the name; the
    * suffix just keeps listings self-describing). */
  def puffinName(commitId: String): String = s"$commitId-deletes.puffin"

  // ------------------------------------------- standalone oracle decoder

  /** FROM-SCRATCH portable-format parser for the oracle: walks the written
    * bytes of one framed DV blob with no RoaringBitmap-library involvement
    * — 64-bit key wrapper, both serial cookies (12346 plain / 12347 with
    * the run-container bitset), array, bitmap and run containers. Agreement
    * between this and [[decodeBlob]] on the same bytes is the spec-
    * conformance proof the DV contract query pins. */
  def decodePositionsStandalone(blob: Array[Byte]): Array[Long] = {
    val head = ByteBuffer.wrap(blob)
    val len = head.getInt()
    require(len == blob.length - 8, s"blob length field $len vs ${blob.length}")
    require((0 until 4).forall(i => blob(4 + i) == DvMagic(i)), "bad DV magic")
    val crc = new CRC32()
    crc.update(blob, 4, len)
    require(ByteBuffer.wrap(blob, 4 + len, 4).getInt() == crc.getValue.toInt,
      "DV CRC mismatch (standalone)")
    val buf = ByteBuffer.wrap(blob, 8, len - 4).slice().order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    val nKeys = buf.getLong()
    var k = 0L
    while (k < nKeys) {
      val hi = (buf.getInt().toLong & 0xFFFFFFFFL) << 32
      decode32Into(buf, hi, out)
      k += 1
    }
    out.result()
  }

  /** One 32-bit roaring bitmap in portable form, consumed from `buf`'s
    * current position (containers follow their headers in order, so the
    * offset header — when present — is read and skipped, not trusted). */
  private def decode32Into(buf: ByteBuffer, hi: Long,
      out: scala.collection.mutable.ArrayBuilder[Long]): Unit = {
    val cookie = buf.getInt()
    val (nContainers, runFlags) =
      if ((cookie & 0xFFFF) == 12347) { // SERIAL_COOKIE: run containers possible
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, flags)
      } else if (cookie == 12346) { // SERIAL_COOKIE_NO_RUNCONTAINER
        (buf.getInt(), null)
      } else throw new IllegalStateException(s"bad roaring cookie $cookie")
    def isRun(i: Int): Boolean =
      runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = buf.getShort() & 0xFFFF
      cards(i) = (buf.getShort() & 0xFFFF) + 1
      i += 1
    }
    // offset header present without runs, or with runs when >= 4 containers
    if (runFlags == null || nContainers >= 4)
      buf.position(buf.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val base = hi | (keys(i).toLong << 16)
      if (isRun(i)) {
        val nRuns = buf.getShort() & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort() & 0xFFFF
          val rlen = buf.getShort() & 0xFFFF // run holds start..start+rlen
          var v = start
          while (v <= start + rlen) { out += base | v; v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) { // array container: sorted u16 values
        var c = 0
        while (c < cards(i)) { out += base | (buf.getShort() & 0xFFFF); c += 1 }
      } else { // bitmap container: 1024 LE 64-bit words
        var w = 0
        while (w < 1024) {
          var word = buf.getLong()
          val wordBase = base | (w.toLong << 6)
          while (word != 0L) {
            out += wordBase | java.lang.Long.numberOfTrailingZeros(word)
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }
}
