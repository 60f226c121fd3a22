package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the pipeline
  * as opaque `binary` payloads with a typed metadata struct alongside.
  *
  * The Spark side — schema, partition-sized batching, typed mapPartitions,
  * pushdown-friendly metadata columns — is real and tested. The actual media
  * decode is STUBBED with a deterministic fake (this environment has no
  * image/audio codecs); swap [[MediaCodec.decodeStub]] for a real decoder
  * (e.g. a JNI/FFI call) without touching the surrounding plan.
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
      MediaFeatures(r.doc_id, r.media_type, r.byte_len, width, height,
        n_frames = 1, feature)
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
    media.as[MediaRecord].mapPartitions(_.map(MediaCodec.decodeStub))
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
