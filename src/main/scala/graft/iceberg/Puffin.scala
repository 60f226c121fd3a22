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
}
