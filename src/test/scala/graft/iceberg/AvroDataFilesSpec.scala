package graft.iceberg

import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Foreign-written AVRO data files: `addFiles` imports them with row counts
  * read from block headers (no record decode), scans read them through the
  * avro-core row reader (mixed-format tables plan one scan per format
  * behind a single Batch), and row-level operations refuse them loudly. */
class AvroDataFilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_avro").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  /** Write rows as an Avro container file with avro-core (the same library
    * a foreign engine would use) and return its path. Strings use a
    * nullable union, the common Avro shape. */
  private def avroFile(rows: Seq[(Long, String)]): String = {
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},
        |{"name":"cat","type":["null","string"],"default":null}]}""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_ext")
    val f = new java.io.File(dir.toFile, "part-0.avro")
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, f)
    rows.foreach { case (k, cat) =>
      val r = new GenericData.Record(avroSchema)
      r.put("k", k)
      r.put("cat", cat)
      w.append(r)
    }
    w.close()
    f.getAbsolutePath
  }

  test("addFiles imports Avro files; scans, filters, and aggregates read them") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.addFiles(spark, url,
      Seq(avroFile((1L to 20L).map(i => (i, s"c${i % 3}")))), "avro")

    val t = IcebergTable.load(spark, url)
    assert(t.liveFiles().forall(_.fileFormat == "AVRO"))
    assert(t.countFromStats().contains(20L), "block-header row counts feed the stats")
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq == (1L to 20L))
    // residual filters evaluate row-level above the scan
    assert(t.read().filter($"k" <= 5).count() == 5)
    assert(t.read().groupBy("cat").count().count() == 3)
  }

  test("schema evolution: a column absent from the Avro file reads null") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.addFiles(spark, url,
      Seq(avroFile(Seq((1L, "a"), (2L, "b")))), "avro")
    IcebergWriter.addColumn(spark, url, "score", "double")
    val t = IcebergTable.load(spark, url)
    val rows = t.read().select("k", "score")
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, None), (2L, None)))
  }

  test("mixed parquet + avro table reads both formats in one scan") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, "pq")).toDF("k", "cat").coalesce(1))
    IcebergWriter.addFiles(spark, url,
      Seq(avroFile((11L to 20L).map(i => (i, "av")))), "avro")

    val t = IcebergTable.load(spark, url)
    assert(t.liveFiles().map(_.fileFormat).toSet == Set("PARQUET", "AVRO"))
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq == (1L to 20L))

    // row-level deletes refuse the avro file (no row index to target)
    val e = intercept[UnsupportedOperationException] {
      IcebergWriter.deleteRows(spark, url, Pruning.And(
        Pruning.GtEq("k", 5L), Pruning.Lt("k", 15L)))
    }
    assert(e.getMessage.contains("AVRO"))

    // compaction folds everything to parquet, unblocking row-level DML
    Maintenance.compact(spark, url, targetFiles = Some(1))
    val t2 = IcebergTable.load(spark, url)
    assert(t2.liveFiles().forall(_.fileFormat == "PARQUET"))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 7L))
    assert(IcebergTable.load(spark, url).read().count() == 19)
  }
}
