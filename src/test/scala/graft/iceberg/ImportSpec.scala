package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet import/migration: `addFiles` harvests FULL footer stats (by-name
  * resolution for id-less foreign files), so imported tables prune exactly
  * like natively written ones; `importParquetDir` migrates a plain parquet
  * directory in one metadata commit. */
class ImportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("imported parquet files carry column bounds and prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft_imp").toString
    val ext = s"$dir/ext"
    // 4 disjoint-range files written by PLAIN Spark (no field ids)
    (0 until 4).foreach(i =>
      ((i * 100L) until (i * 100L + 100)).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(ext))
    val parts = new java.io.File(ext).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq.sorted

    val url = s"$dir/t"
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.addFiles(spark, url, parts, "parquet")

    val t = IcebergTable.load(spark, url)
    assert(t.countFromStats().contains(400L))
    assert(t.liveFiles().forall(_.lowerBounds.nonEmpty), "bounds harvested")
    // stats pruning: a point query plans exactly one of the 4 files
    assert(t.prunedFiles(Pruning.Eq("k", 250L)).size == 1)
    assert(t.read(filters = Seq(Seq(("k", "==", 250))))
      .as[(Long, String)].collect().toSeq == Seq((250L, "v250")))
  }

  test("importParquetDir migrates a directory in one metadata commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_imp2").toString
    val ext = s"$dir/ext"
    (1L to 50L).map(k => (k, k * 2.0)).toDF("a", "b")
      .repartition(3).write.parquet(ext)

    val url = s"$dir/t"
    IcebergWriter.importParquetDir(spark, url, ext)
    val t = IcebergTable.load(spark, url)
    assert(t.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(t.read().count() == 50)
    assert(t.countFromStats().contains(50L))
    assert(t.summary("operation") == "append")
    // the import is metadata-only: the data files are the ORIGINAL ones
    // (paths may come back fs-qualified, e.g. file:/…)
    assert(t.liveFiles().forall(f => t.resolvePath(f.filePath).contains(ext)))
  }
}
