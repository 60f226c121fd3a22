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
    media.as[MediaRecord].mapPartitions(_.map(MediaCodec.decodeStub))
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
