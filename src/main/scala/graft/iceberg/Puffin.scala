package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The puffin FILE ENVELOPE (spec "Puffin file format"): leading magic,
  * concatenated blobs, then a footer of magic + JSON payload + a 12-byte
  * tail (payload length, flags, magic). Shared by every puffin-producing
  * path — deletion vectors ([[DeletionVectors.writePuffin]]) and table
  * statistics ([[TableStatistics]]) — so the framing exists ONCE; only the
  * per-blob content and the footer JSON differ per producer.
  */
private[iceberg] object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte) // "PFA1"

  /** Write the envelope around `blobs` (already in their on-disk framing —
    * raw for theta sketches, magic+CRC-framed for DVs). `payloadFor`
    * renders the footer JSON from each blob's recorded (offset, length).
    * Returns the blob locations, the total file length, and the footer
    * length (magic + payload + tail — the metadata fields engines expect).
    * `overwrite` is for executor-side writers whose retried task re-creates
    * the same per-partition path. */
  def write(path: String, conf: Configuration, blobs: Seq[Array[Byte]],
      payloadFor: Seq[(Long, Long)] => Array[Byte],
      overwrite: Boolean = false): (Seq[(Long, Long)], Long, Long) = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, overwrite)
    try {
      out.write(Magic)
      var offset = 4L
      val located = blobs.map { bytes =>
        out.write(bytes)
        val loc = (offset, bytes.length.toLong)
        offset += bytes.length
        loc
      }
      val payload = payloadFor(located)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: payload uncompressed
      tail.put(Magic)
      out.write(tail.array())
      val footerLen = 4L + payload.length + 12
      (located, offset + footerLen, footerLen)
    } finally out.close()
  }

  /** Decode a blob per its footer `compression-codec` property (spec
    * "Compression codecs": absent = uncompressed, `lz4` = LZ4 frame,
    * `zstd` = Zstandard frame). Both codecs ship on Spark's own classpath
    * (lz4-java / zstd-jni back shuffle compression), so puffins written by
    * other engines — iceberg-java compresses statistics blobs with zstd by
    * default — read without extra dependencies. Unknown codecs refuse
    * loudly instead of yielding garbage bytes. */
  def decompress(codec: Option[String], bytes: Array[Byte]): Array[Byte] =
    codec.map(_.toLowerCase) match {
      case None => bytes
      case Some("zstd") =>
        val size = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
        if (size > 0 && size <= Int.MaxValue)
          com.github.luben.zstd.Zstd.decompress(bytes, size.toInt)
        else {
          // streaming zstd writers emit frames with NO content size in the
          // header (getFrameContentSize reports 0/unknown) — spec-valid, so
          // fall back to streaming decompression instead of refusing
          val in = new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 3))
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            out.toByteArray
          } finally in.close()
        }
      case Some("lz4") => lz4Decompress(bytes)
      case Some(other) =>
        throw new UnsupportedOperationException(
          s"unsupported puffin compression-codec '$other' (lz4|zstd)")
    }

  /** Zstd-compress a blob for writing (level 3 — zstd-jni's sweet spot for
    * sketch-sized payloads). */
  def compressZstd(bytes: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(bytes, 3)

  /** LZ4 FRAME decompression — also the footer-payload codec the spec's
    * flag bit 0 selects (readers must at least tolerate it). */
  def lz4Decompress(bytes: Array[Byte]): Array[Byte] = {
    val in = new net.jpountz.lz4.LZ4FrameInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 3))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
}
