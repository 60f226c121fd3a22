package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Orphan-file cleanup ([[Maintenance.removeOrphans]]): unreferenced bytes
  * from failed commits are reclaimed; everything any snapshot references —
  * and anything newer than the in-flight-commit guard — survives. */
class OrphanFilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("orphans older than the guard are deleted; referenced files survive") {
    val url = java.nio.file.Files.createTempDirectory("graft_orph").toString + "/t"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 10L).map(i => (i, "a")).toDF("k", "v"))
    IcebergWriter.append(spark, url, (11L to 20L).map(i => (i, "b")).toDF("k", "v"))

    // a "failed commit": data + manifest files nobody references
    val dataDir = new java.io.File(s"$url/data/deadbeef")
    dataDir.mkdirs()
    val orphanData = new java.io.File(dataDir, "part-0.parquet")
    java.nio.file.Files.writeString(orphanData.toPath, "not real parquet")
    val orphanManifest = new java.io.File(s"$url/metadata/deadbeef-m0.avro")
    java.nio.file.Files.writeString(orphanManifest.toPath, "not real avro")
    // age them past the in-flight guard
    val old = System.currentTimeMillis() - 10L * 24 * 3600 * 1000
    orphanData.setLastModified(old)
    orphanManifest.setLastModified(old)

    val deleted = Maintenance.removeOrphans(spark, url)
    assert(deleted == 2, s"deleted $deleted")
    assert(!orphanData.exists() && !orphanManifest.exists())

    // the table (current AND time travel) is untouched
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 20)
    assert(t.snapshotRelative(-1).read().count() == 10)
  }

  test("recent unreferenced files survive (in-flight commit guard)") {
    val url = java.nio.file.Files.createTempDirectory("graft_orph2").toString + "/t"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v"))
    val recent = new java.io.File(s"$url/data/inflight.parquet")
    java.nio.file.Files.writeString(recent.toPath, "in-flight data")
    assert(Maintenance.removeOrphans(spark, url) == 0)
    assert(recent.exists())
    // with the guard relaxed, it is an orphan
    assert(Maintenance.removeOrphans(spark, url, olderThanMs = 0L) == 1)
    assert(!recent.exists())
  }
}
