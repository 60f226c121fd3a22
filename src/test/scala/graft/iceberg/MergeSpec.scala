package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE / upsert: matched target rows are superseded via v2 position
  * deletes, source rows are appended, all in ONE snapshot. */
class MergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_ice_merge").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("upsert: updates replace matched rows, inserts add new ones, one snapshot") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"old$i")).toDF("k", "v").coalesce(1))

    // 3 updates (k=2,5,9) + 2 inserts (k=11,12)
    IcebergWriter.merge(spark, url,
      Seq((2L, "new2"), (5L, "new5"), (9L, "new9"), (11L, "new11"), (12L, "new12"))
        .toDF("k", "v"), Seq("k"))

    val t = IcebergTable.load(spark, url)
    assert(t.snapshots.size == 2, "merge must be ONE snapshot")
    assert(t.summary("operation") == "overwrite")
    assert(t.summary("added-position-deletes") == "3")
    assert(t.summary("added-records") == "5")
    assert(t.summary("total-records") == "12")
    assert(t.summary("graft-merge-keys") == "k")

    val got = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = ((1L to 10L).filterNot(Set(2L, 5L, 9L)).map(i => (i, s"old$i")) ++
      Seq((2L, "new2"), (5L, "new5"), (9L, "new9"), (11L, "new11"), (12L, "new12")))
      .sortBy(_._1)
    assert(got == want)
    // stats-only count stays exact under merge-on-read
    assert(t.countFromStats().contains(12L))
    // time travel still sees the pre-merge rows
    assert(t.snapshotRelative(-1).read().count() == 10)
  }

  test("merge into an empty table is a plain append") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.merge(spark, url, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    val t = IcebergTable.load(spark, url)
    assert(t.snapshots.size == 1)
    assert(t.summary("operation") == "append")
    assert(t.read().count() == 2)
  }

  test("consecutive merges over the same key stay exact (no double-delete)") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 5L).map(i => (i, s"v0_$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.merge(spark, url, Seq((3L, "v1_3")).toDF("k", "v"), Seq("k"))
    IcebergWriter.merge(spark, url, Seq((3L, "v2_3")).toDF("k", "v"), Seq("k"))

    val t = IcebergTable.load(spark, url)
    val got = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "v0_1"), (2L, "v0_2"), (3L, "v2_3"), (4L, "v0_4"), (5L, "v0_5")))
    assert(t.summary("total-records") == "5")
    assert(t.countFromStats().contains(5L))
  }

  test("overlapping deleteRows calls do not double-count shared positions") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 100L).map(i => (i, s"c$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(spark, url,
      Pruning.And(Pruning.GtEq("k", 40), Pruning.Lt("k", 60))) // 40..59 (20 rows)
    IcebergWriter.deleteRows(spark, url,
      Pruning.And(Pruning.GtEq("k", 50), Pruning.Lt("k", 70))) // 50..69, 10 fresh

    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 70)
    assert(t.summary("total-records") == "70")
    assert(t.countFromStats().contains(70L))
  }

  test("merge on a hidden-partitioned table keeps partition pruning sound") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema, Seq("v" -> "identity"))
    IcebergWriter.append(spark, url,
      (1L to 20L).map(i => (i, s"p${i % 2}")).toDF("k", "v"))
    IcebergWriter.merge(spark, url,
      Seq((4L, "p0"), (21L, "p1")).toDF("k", "v"), Seq("k"))

    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 21)
    val p1 = t.readWhere(Pruning.Eq("v", "p1")).as[(Long, String)].collect()
    assert(p1.map(_._1).sorted.toSeq ==
      (1L to 20L).filter(_ % 2 == 1) :+ 21L)
  }
}
