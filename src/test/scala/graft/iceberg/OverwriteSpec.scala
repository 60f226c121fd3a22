package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Single-snapshot overwrite: DELETED + ADDED entries committed together
  * with operation=overwrite — matching the golden fixture's own history
  * (v5.metadata.json holds one overwrite snapshot; `ice.py:196-203`
  * reconciles DELETED entries within a single snapshot's manifests). */
class OverwriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_ice_ovw").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  test("partition overwrite is ONE snapshot with operation=overwrite") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq("cat" -> "identity"))
    IcebergWriter.append(spark, url,
      (1L to 60L).map(i => (i, s"c${i % 3}")).toDF("k", "cat"))
    IcebergWriter.overwrite(spark, url,
      Seq((1001L, "c1"), (1002L, "c1")).toDF("k", "cat"), Pruning.Eq("cat", "c1"))

    val t = IcebergTable.load(spark, url)
    // exactly one snapshot was added (not delete+append = two)
    assert(t.snapshots.size == 2)
    assert(t.summary("operation") == "overwrite")
    assert(t.summary("deleted-records") == "20")
    assert(t.summary("added-records") == "2")
    assert(t.summary("total-records") == "42")
    // new data visible, old c1 rows gone
    assert(t.read().count() == 42)
    val c1 = t.read(filters = Seq(Seq(("cat", "==", "c1")))).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(c1.map(_._1).toSeq == Seq(1001L, 1002L))
    // one step back restores the pre-overwrite table
    val prev = t.snapshotRelative(-1)
    assert(prev.read().count() == 60)
    assert(prev.read(filters = Seq(Seq(("cat", "==", "c1")))).count() == 20)
    // stats stay exact through the mixed-status manifest
    assert(t.countFromStats().contains(42L))
  }

  test("full-table overwrite (AlwaysTrue) replaces everything") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a"), (2L, "b")).toDF("k", "cat"))
    IcebergWriter.overwrite(spark, url, Seq((9L, "z")).toDF("k", "cat"))
    val t = IcebergTable.load(spark, url)
    assert(t.read().as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(t.snapshotRelative(-1).read().count() == 2)
    assert(t.summary("operation") == "overwrite")
  }

  test("overwrite that would split a file is refused") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, "a")).toDF("k", "cat").coalesce(1))
    intercept[UnsupportedOperationException] {
      IcebergWriter.overwrite(spark, url, Seq((99L, "a")).toDF("k", "cat"),
        Pruning.Lt("k", 5))
    }
  }

  test("filtered reads stay sound across the overwrite boundary") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq("cat" -> "identity"))
    IcebergWriter.append(spark, url,
      (1L to 30L).map(i => (i, s"c${i % 3}")).toDF("k", "cat"))
    IcebergWriter.overwrite(spark, url,
      Seq((500L, "c2")).toDF("k", "cat"), Pruning.Eq("cat", "c2"))
    val t = IcebergTable.load(spark, url)
    // a filter that targets an untouched partition must not see deleted rows
    assert(t.read(filters = Seq(Seq(("cat", "==", "c0")))).count() == 10)
    // and the replaced partition returns only the new row under any filter
    assert(t.read(filters = Seq(Seq(("k", ">", 100)))).count() == 1)
  }
}
