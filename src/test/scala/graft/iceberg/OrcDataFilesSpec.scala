package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Foreign-written ORC data files: `addFiles` imports them in O(files)
  * metadata work, scans read them through Spark's vectorized ORC reader
  * (mixed parquet+ORC tables plan one scan per format behind a single
  * Batch), and row-level deletes refuse them loudly — the parquet row
  * index they need does not exist for ORC. */
class OrcDataFilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_orc").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  /** Write rows as ORC outside the table and return the part-file paths. */
  private def orcParts(rows: Seq[(Long, String)], parts: Int = 1): Seq[String] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_ext").toString + "/files"
    rows.toDF("k", "cat").repartition(parts).write.orc(dir)
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".orc")).map(_.getAbsolutePath).toSeq
  }

  test("addFiles imports ORC files metadata-only; scans and filters read them") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    val ext = orcParts((1L to 20L).map(i => (i, s"c${i % 3}")))
    IcebergWriter.addFiles(spark, url, ext, "orc")

    val t = IcebergTable.load(spark, url)
    assert(t.liveFiles().forall(_.fileFormat == "ORC"))
    assert(t.countFromStats().contains(20L), "footer row counts feed the stats")
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq == (1L to 20L))
    // row-level filters evaluate exactly even with no column bounds recorded
    assert(t.read().filter($"k" <= 5).count() == 5)
    assert(t.read().select("cat").distinct().count() == 3)
  }

  test("mixed parquet + ORC table reads both formats in ONE scan") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, "pq")).toDF("k", "cat").coalesce(1))
    IcebergWriter.addFiles(spark, url,
      orcParts((11L to 20L).map(i => (i, "orc"))), "orc")

    val t = IcebergTable.load(spark, url)
    assert(t.liveFiles().map(_.fileFormat).toSet == Set("PARQUET", "ORC"))
    val got = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == (1L to 10L).map(i => (i, "pq")) ++ (11L to 20L).map(i => (i, "orc")))
    assert(t.read().filter($"k" > 5 && $"k" <= 15).count() == 10)
    // SQL over the catalog sees the same union
    val cat = s"orc${url.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      url.stripSuffix("/tbl"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.tbl").as[Long].head() == 20L)
  }

  test("row-level deletes refuse ORC files; whole-file deletes work") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.addFiles(spark, url,
      orcParts((1L to 10L).map(i => (i, "a"))), "orc")

    // splitting a file needs position deletes → parquet row index → refuse
    val e1 = intercept[UnsupportedOperationException] {
      IcebergWriter.deleteRows(spark, url, Pruning.Lt("k", 5))
    }
    assert(e1.getMessage.contains("parquet"))
    val e2 = intercept[UnsupportedOperationException] {
      IcebergWriter.upsert(spark, url, Seq((1L, "up")).toDF("k", "cat"), Seq("k"))
    }
    assert(e2.getMessage.contains("parquet"))
    val e3 = intercept[UnsupportedOperationException] {
      IcebergWriter.equalityDelete(spark, url, Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    }
    assert(e3.getMessage.contains("parquet"))

    // dropping whole files is pure metadata — fine for any format
    IcebergWriter.deleteRows(spark, url, Pruning.AlwaysTrue)
    assert(IcebergTable.load(spark, url).read().count() == 0)
  }

  test("compaction rewrites ORC (and the deletes refusal) away to parquet") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.addFiles(spark, url,
      orcParts((1L to 30L).map(i => (i, s"v$i")), parts = 2), "orc")
    Maintenance.compact(spark, url, targetFiles = Some(1))
    val t = IcebergTable.load(spark, url)
    assert(t.liveFiles().forall(_.fileFormat == "PARQUET"),
      "compaction is the ORC->parquet escape hatch")
    assert(t.read().count() == 30)
    // row-level ops work again
    IcebergWriter.deleteRows(spark, url, Pruning.Lt("k", 4))
    assert(IcebergTable.load(spark, url).read().count() == 27)
  }
}
