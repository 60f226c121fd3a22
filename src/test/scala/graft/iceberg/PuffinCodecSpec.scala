package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Puffin compression codecs (spec "Compression codecs"): zstd-compressed
  * statistics blobs round-trip (iceberg-java's default write form),
  * LZ4-frame-compressed footers read (the spec's flag bit 0), and
  * compressed deletion-vector blobs REFUSE (the spec forbids them). */
class PuffinCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  test("zstd stats blobs: write via table property, read + incremental union") {
    val url = fresh("graft_zstd")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.setProperties(spark, url,
      Map("write.stats.compression-codec" -> "zstd"))
    IcebergWriter.append(spark, url,
      (1L to 400L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(2))
    val ndvs = Maintenance.computeStatistics(spark, url)

    val t = IcebergTable.load(spark, url)
    val entry = t.metadata.statistics.head
    val conf = spark.sessionState.newHadoopConf()
    // the footer records the codec and the on-disk blob is the COMPRESSED
    // form; readSketches decodes it back to the exact registered estimates
    val blobs = TableStatistics.readSketches(t.resolvePath(entry.path), conf)
    assert(blobs.nonEmpty)
    val kField = t.iceSchema.fields.find(_.name == "k").get.id
    assert(blobs.find(_.fieldId == kField).get.ndv == ndvs(kField))
    assert(ndvs(kField) == 400L, "400 longs sketch exactly at this size")

    // incremental refresh unions FROM the compressed prior puffin
    IcebergWriter.append(spark, url,
      (401L to 500L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    val before = TableStatistics.incrementalUnions.get
    val ndvs2 = TableStatistics.computeIncremental(spark, url)
    assert(TableStatistics.incrementalUnions.get == before + 1,
      "must take the union path, not a full recompute")
    assert(ndvs2(kField) == 500L)
  }

  test("bogus write codec refuses; 'none' means uncompressed") {
    val url = fresh("graft_codec_bad")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v"))
    IcebergWriter.setProperties(spark, url,
      Map("write.stats.compression-codec" -> "snappy"))
    intercept[IllegalArgumentException] {
      Maintenance.computeStatistics(spark, url)
    }
    IcebergWriter.setProperties(spark, url,
      Map("write.stats.compression-codec" -> "none"))
    assert(Maintenance.computeStatistics(spark, url).nonEmpty)
  }

  test("LZ4-frame-compressed footer payload reads (spec flag bit 0)") {
    // hand-build a puffin: one RAW theta blob + an lz4-compressed footer
    val sk = org.apache.datasketches.theta.UpdateSketch.builder().build()
    (1L to 123L).foreach(sk.update)
    val blob = sk.compact().toByteArray
    val payload =
      (s"""{"blobs":[{"type":"${TableStatistics.ThetaBlobType}",""" +
        s""""fields":[1],"snapshot-id":7,"sequence-number":1,""" +
        s""""offset":4,"length":${blob.length},""" +
        s""""properties":{"ndv":"123"}}],"properties":{}}""")
        .getBytes(StandardCharsets.UTF_8)
    val compressed = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      out.write(payload); out.close()
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_lz4")
    val path = s"$dir/footer.puffin"
    val fos = new java.io.FileOutputStream(path)
    fos.write(Puffin.Magic)
    fos.write(blob)
    fos.write(Puffin.Magic)
    fos.write(compressed)
    val tail = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(compressed.length)
    tail.putInt(1) // flag bit 0: footer payload LZ4-compressed
    tail.put(Puffin.Magic)
    fos.write(tail.array()); fos.close()

    val got = TableStatistics.readSketches(path,
      spark.sessionState.newHadoopConf())
    assert(got.map(b => b.fieldId -> b.ndv) == Seq(1 -> 123L))
  }

  test("streaming zstd blob (no frame content size) and explicit JSON " +
      "null codec both read") {
    def theta(n: Long): Array[Byte] = {
      val sk = org.apache.datasketches.theta.UpdateSketch.builder().build()
      (1L to n).foreach(sk.update)
      sk.compact().toByteArray
    }
    val raw1 = theta(77)
    // STREAMING zstd: ZstdOutputStream writes frames with NO content size
    // in the header (spec-valid) — the reader must fall back to streaming
    // decompression instead of refusing
    val z1 = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new com.github.luben.zstd.ZstdOutputStream(bos)
      out.write(raw1); out.close()
      bos.toByteArray
    }
    assert(com.github.luben.zstd.Zstd.getFrameContentSize(z1) <= 0,
      "precondition: the streamed frame must carry no content size")
    val raw2 = theta(55)
    val payload =
      (s"""{"blobs":[{"type":"${TableStatistics.ThetaBlobType}",""" +
        s""""fields":[1],"snapshot-id":7,"sequence-number":1,""" +
        s""""offset":4,"length":${z1.length},""" +
        s""""compression-codec":"zstd","properties":{}},""" +
        s"""{"type":"${TableStatistics.ThetaBlobType}",""" +
        s""""fields":[2],"snapshot-id":7,"sequence-number":1,""" +
        s""""offset":${4 + z1.length},"length":${raw2.length},""" +
        s""""compression-codec":null,"properties":{}}],"properties":{}}""")
        .getBytes(StandardCharsets.UTF_8)
    val dir = java.nio.file.Files.createTempDirectory("graft_zstream")
    val path = s"$dir/stream.puffin"
    val fos = new java.io.FileOutputStream(path)
    fos.write(Puffin.Magic)
    fos.write(z1)
    fos.write(raw2)
    fos.write(Puffin.Magic)
    fos.write(payload)
    val tail = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.putInt(0)
    tail.put(Puffin.Magic)
    fos.write(tail.array()); fos.close()

    val got = TableStatistics.readSketches(path,
      spark.sessionState.newHadoopConf())
    assert(got.map(b => b.fieldId -> b.ndv).sortBy(_._1) ==
      Seq(1 -> 77L, 2 -> 55L),
      "streamed-zstd and null-codec blobs must both decode")
  }

  test("compressed deletion-vector blobs refuse (spec forbids)") {
    val vec = DeletionVectors.frameBlob(
      DeletionVectors.serializePositions(Array(0L, 5L, 9L)))
    val payload =
      ("""{"blobs":[{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":1,"sequence-number":1,"offset":4,""" +
        s""""length":${vec.length},"compression-codec":"zstd",""" +
        """"properties":{"referenced-data-file":"/d/f.parquet","cardinality":"3"}}]}""")
        .getBytes(StandardCharsets.UTF_8)
    val dir = java.nio.file.Files.createTempDirectory("graft_dvrefuse")
    val path = s"$dir/bad.puffin"
    val fos = new java.io.FileOutputStream(path)
    fos.write(Puffin.Magic)
    fos.write(vec)
    fos.write(Puffin.Magic)
    fos.write(payload)
    val tail = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.putInt(0)
    tail.put(Puffin.Magic)
    fos.write(tail.array()); fos.close()

    val e = intercept[IllegalArgumentException] {
      DeletionVectors.readPuffin(path, spark.sessionState.newHadoopConf())
    }
    assert(e.getMessage.contains("must not be compressed"))
  }
}
