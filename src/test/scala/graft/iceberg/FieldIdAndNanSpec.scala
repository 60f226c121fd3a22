package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Field-id column resolution (Iceberg resolves by ID, renames are legal)
  * and NaN-aware pruning (NaN sorts after everything; bounds exclude it). */
class FieldIdAndNanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_fid").toString + "/tbl"

  test("renamed column resolves by field id, not name") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType))))
    IcebergWriter.append(spark, url, Seq((1L, "a"), (2L, "b")).toDF("k", "cat"))

    // simulate an Iceberg column rename: same field id 2, new name
    // (rewrite through Hadoop FS so the local .crc stays consistent)
    val conf = spark.sessionState.newHadoopConf()
    val metaPath = new org.apache.hadoop.fs.Path(s"$url/metadata/v2.metadata.json")
    val fs = metaPath.getFileSystem(conf)
    val in = fs.open(metaPath)
    val renamed = try new String(in.readAllBytes(), "UTF-8")
      .replace("\"cat\"", "\"category\"") finally in.close()
    val out = fs.create(metaPath, true)
    try out.write(renamed.getBytes("UTF-8")) finally out.close()

    val t = IcebergTable.load(spark, url)
    assert(t.schema.fieldNames.toSeq == Seq("k", "category"))
    // data written under the OLD name reads back by id — values, not nulls
    val rows = t.read().orderBy("k").as[(Long, String)].collect()
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("written files carry parquet field ids") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType))))
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "cat"))
    val t = IcebergTable.load(spark, url)
    val file = t.resolvePath(t.liveFiles().head.filePath)
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), spark.sessionState.newHadoopConf()))
    val schema = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
    assert(schema.getFields.get(0).getId.intValue() == 1)
    assert(schema.getFields.get(1).getId.intValue() == 2)
  }

  test("NaN-polluted double file is never pruned by > / >= / != predicates") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("x", DoubleType))))
    // file A: plain values; file B: contains NaN (parquet drops its bounds)
    IcebergWriter.append(spark, url,
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "x").coalesce(1))
    IcebergWriter.append(spark, url,
      Seq((3L, 0.1), (4L, Double.NaN)).toDF("k", "x").coalesce(1))

    val t = IcebergTable.load(spark, url)
    val files = t.liveFiles()
    val ctx = Pruning.Context(
      t.iceSchema.fields.map(f =>
        f.name -> Pruning.FieldInfo(f.id, f.name, f.icebergTypeString)).toMap,
      t.partitionSpec)
    val xId = t.iceSchema.fields.find(_.name == "x").get.id
    val nanFile = files.find(_.lowerBounds.get(xId).isEmpty).get
    val cleanFile = files.find(_.lowerBounds.get(xId).nonEmpty).get
    // clean file: proven NaN-free, bounds usable
    assert(cleanFile.nanValueCounts.get(xId).contains(0L))
    // NaN file has no x bounds -> never pruned; and even with bounds a file
    // lacking nan evidence must survive NaN-sensitive predicates
    assert(Pruning.fileMightMatch(Pruning.Gt("x", 100.0), nanFile, ctx))
    // the clean file IS prunable for an impossible range (nan evidence = 0)
    assert(!Pruning.fileMightMatch(Pruning.Gt("x", 100.0), cleanFile, ctx))
    // end-to-end: x > 100 matches exactly the NaN row under Spark semantics
    val got = t.read(filters = Seq(Seq(("x", ">", 100.0)))).select("k")
      .as[Long].collect()
    assert(got.toSeq == Seq(4L), s"got ${got.toSeq}")
    // and < keeps its full pruning power (NaN never satisfies <)
    assert(t.read(filters = Seq(Seq(("x", "<", 0.5)))).count() == 1)
  }

  test("imported foreign parquet carries NO nan-count claim") {
    val base = java.nio.file.Files.createTempDirectory("graft_impnan").toString
    val url = s"$base/tbl"
    // a foreign float file (written by Spark here, but the import path must
    // not assume any writer's NaN/stats discipline)
    val ext = s"$base/ext"
    Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)).toDF("k", "x").coalesce(1).write.parquet(ext)
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("x", DoubleType))))
    val parts = new java.io.File(ext).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    IcebergWriter.addFiles(spark, url, parts)
    val f = IcebergTable.load(spark, url).liveFiles().head
    assert(f.nanValueCounts.isEmpty,
      s"imported file must not claim nan counts, got ${f.nanValueCounts}")
    // bounds for the long column are still harvested and usable
    assert(f.lowerBounds.nonEmpty)
  }

  test("foreign parquet under a /data/ path is detected via the import marker") {
    val base = java.nio.file.Files.createTempDirectory("graft_impmark").toString
    val url = s"$base/tbl"
    // adversarial layout: the FOREIGN file's own path contains '/data/' —
    // the old path heuristic would misread it as native and the field-id
    // read would refuse the id-less file
    val ext = s"$base/data"
    Seq((10L, "x"), (20L, "y")).toDF("k", "v").coalesce(1).write.parquet(ext)
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    val parts = new java.io.File(ext).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    IcebergWriter.addFiles(spark, url, parts)
    val got = spark.read.format("graft-iceberg").load(url)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((10L, "x"), (20L, "y")))
  }

  test("nanSensitive truth table") {
    import Pruning._
    assert(nanSensitive(Gt("x", 1.0), "double"))
    assert(nanSensitive(GtEq("x", 1.0), "float"))
    assert(nanSensitive(NotEq("x", 1.0), "double"))
    assert(!nanSensitive(NotEq("x", Double.NaN), "double")) // NaN != NaN is false
    assert(nanSensitive(Eq("x", Double.NaN), "double"))
    assert(!nanSensitive(Eq("x", 1.0), "double"))
    assert(!nanSensitive(Lt("x", 1.0), "double"))
    assert(!nanSensitive(LtEq("x", 1.0), "double"))
    assert(!nanSensitive(Gt("x", 1L), "long")) // only float/double
  }
}
