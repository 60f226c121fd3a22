package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `rewrite_table_path` (DR / table copy): the staged metadata + copy plan
  * must reconstruct a COMPLETE, independently loadable table at the target
  * prefix — rows, history, row-level deletes — while the source table stays
  * untouched. */
class RewriteTablePathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Execute the emitted copy plan with plain filesystem copies. */
  private def runCopyPlan(fileList: String): Int = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(fileList.stripPrefix("file:")))
    lines.forEach { line =>
      val Array(src, dst) = line.split('\t')
      val from = java.nio.file.Paths.get(src.stripPrefix("file:"))
      val to = java.nio.file.Paths.get(dst.stripPrefix("file:"))
      java.nio.file.Files.createDirectories(to.getParent)
      java.nio.file.Files.copy(from, to,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    lines.size
  }

  test("copy plan relocates a multi-commit table with position deletes; " +
      "target loads independently, source untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtp").toString
    val src = s"$root/site_a/db/t"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.append(spark, src,
      (1L to 50L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(spark, src,
      (51L to 100L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    // row-level delete → a delete manifest + parquet carrier in the plan
    IcebergWriter.deleteRows(spark, src, Pruning.LtEq("k", 10L))
    val before = IcebergTable.load(spark, src)
    val beforeRows = before.read().as[(Long, String)].collect().sortBy(_._1)
    assert(beforeRows.length == 90)

    val r = RewriteTablePath.rewrite(spark, src,
      sourcePrefix = s"$root/site_a", targetPrefix = s"$root/site_b")
    assert(r.manifestLists == 3 && r.manifests >= 3 && r.dataFiles >= 3)
    runCopyPlan(r.fileListPath)

    // the target is a complete table: rows, MOR deletes, time travel
    val dst = s"$root/site_b/db/t"
    val t2 = IcebergTable.load(spark, dst)
    assert(t2.read().as[(Long, String)].collect().sortBy(_._1)
      .toSeq == beforeRows.toSeq)
    assert(t2.metadata.snapshots.size == 3, "full history travels")
    val firstSnap = t2.metadata.snapshots.head.snapshotId
    assert(t2.atSnapshot(firstSnap).read().count() == 50)
    // every resolved live path points INSIDE the target prefix
    assert(t2.liveFiles().forall(f =>
      t2.resolvePath(f.filePath).contains("site_b")),
      "rewritten manifests must reference target-prefix paths")
    // the SOURCE is untouched and still serves the same rows
    val again = IcebergTable.load(spark, src)
    assert(again.read().count() == 90)
    assert(again.liveFiles().forall(f =>
      again.resolvePath(f.filePath).contains("site_a")))

    // the target accepts new commits independently of the source
    IcebergWriter.append(spark, dst,
      Seq((999L, "z")).toDF("k", "v").coalesce(1))
    assert(IcebergTable.load(spark, dst).read().count() == 91)
    assert(IcebergTable.load(spark, src).read().count() == 90)
  }

  test("v3 deletion vectors: referenced_data_file rewrites, DV blobs copy, " +
      "MOR reads work at the target") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpdv").toString
    val src = s"$root/east/db/d"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.append(spark, src,
      (1L to 40L).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.upgradeFormatVersion(spark, src, 3)
    IcebergWriter.deleteRows(spark, src, Pruning.Lt("k", 5L))
    val t0 = IcebergTable.load(spark, src)
    assert(t0.positionDeleteFiles.nonEmpty && t0.positionDeleteFiles.forall(_.isDv),
      "setup must leave DV carriers")

    val r = RewriteTablePath.rewrite(spark, src,
      sourcePrefix = s"$root/east", targetPrefix = s"$root/west")
    runCopyPlan(r.fileListPath)

    val t2 = IcebergTable.load(spark, s"$root/west/db/d")
    assert(t2.read().count() == 36, "DV deletes must apply at the target")
    assert(t2.positionDeleteFiles.forall(f =>
      f.referencedDataFile.exists(_.contains("west"))),
      "referenced_data_file must point at the target prefix")
  }

  test("guards: identical prefixes refuse; staging holds the plan and " +
      "rewritten metadata only") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpg").toString
    val src = s"$root/a/db/g"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType))))
    IcebergWriter.append(spark, src, Seq(1L, 2L).map(Tuple1(_)).toDF("k"))
    intercept[IllegalArgumentException] {
      RewriteTablePath.rewrite(spark, src, s"$root/a", s"$root/a")
    }
    val stage = s"$root/stage"
    val r = RewriteTablePath.rewrite(spark, src, s"$root/a", s"$root/b",
      stagingLocation = Some(stage))
    assert(r.stagingLocation == stage)
    val staged = new java.io.File(stage).listFiles().map(_.getName).toSet
    assert(staged.contains("file-list.tsv") &&
      staged.contains("version-hint.text") &&
      staged.exists(_.endsWith(".metadata.json")) &&
      staged.exists(_.endsWith(".avro")))
    // no data bytes in staging — metadata + the plan only
    assert(!staged.exists(_.endsWith(".parquet")))
  }
}
