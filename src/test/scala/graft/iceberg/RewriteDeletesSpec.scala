package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Position-delete consolidation ([[IcebergWriter.rewritePositionDeletes]]):
  * per-commit delete files merge into one, dangling rows drop, reads and
  * counts are unchanged, equality deletes survive untouched. */
class RewriteDeletesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_rwdel").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("per-commit delete files consolidate into one; reads unchanged") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 30L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1))
    // three row-delete commits → three position-delete files
    Seq(3L, 7L, 20L).foreach(k =>
      IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", k)))
    val before = IcebergTable.load(spark, url)
    assert(before.positionDeleteFiles.size == 3)
    val expected = before.read().as[(Long, String)].collect().sorted.toSeq
    assert(expected.map(_._1) == (1L to 30L).filterNot(Set(3L, 7L, 20L)))

    Maintenance.rewritePositionDeletes(spark, url)
    val after = IcebergTable.load(spark, url)
    assert(after.positionDeleteFiles.size == 1, "delete files consolidated")
    assert(after.summary("operation") == "replace")
    assert(after.summary.get("graft-rewrite").contains("position-deletes"))
    assert(after.read().as[(Long, String)].collect().sorted.toSeq == expected)
    // stats-based count still exact (position deletes subtract cleanly)
    assert(after.countFromStats().contains(27L))
    // time travel to the pre-rewrite snapshot still works
    assert(after.snapshotRelative(-1).read().count() == 27L)
  }

  test("equality-delete manifests survive the rewrite untouched") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, "a")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 1L))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 2L))
    // an equality-delete upsert AFTER the position deletes
    IcebergWriter.upsert(spark, url,
      Seq((3L, "u3")).toDF("k", "v").coalesce(1), Seq("k"))
    val before = IcebergTable.load(spark, url)
    assert(before.positionDeleteFiles.size == 2)
    assert(before.equalityDeleteFiles.nonEmpty)
    val expected = before.read().as[(Long, String)].collect().sorted.toSeq

    Maintenance.rewritePositionDeletes(spark, url)
    val after = IcebergTable.load(spark, url)
    assert(after.positionDeleteFiles.size == 1)
    assert(after.equalityDeleteFiles.size == before.equalityDeleteFiles.size)
    assert(after.read().as[(Long, String)].collect().sorted.toSeq == expected)
  }

  test("no-op below the target and on delete-free tables") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v"))
    val v0 = IcebergTable.load(spark, url).version
    Maintenance.rewritePositionDeletes(spark, url) // no deletes at all
    assert(IcebergTable.load(spark, url).version == v0)
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 1L))
    val v1 = IcebergTable.load(spark, url).version
    Maintenance.rewritePositionDeletes(spark, url) // 1 file <= target 1
    assert(IcebergTable.load(spark, url).version == v1)
  }
}
