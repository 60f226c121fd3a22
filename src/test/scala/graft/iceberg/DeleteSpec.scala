package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-file metadata deletes: DELETED manifest entries, reconciliation on
  * read, time travel back across the delete, summary accounting. */
class DeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("cat", StringType)))

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_ice_del").toString + "/tbl"

  test("delete a whole partition; read reconciles; time travel restores") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema, Seq("cat" -> "identity"))
    IcebergWriter.append(spark, url,
      (1L to 90L).map(i => (i, s"c${i % 3}")).toDF("id", "cat"))
    assert(IcebergTable.load(spark, url).read().count() == 90)

    IcebergWriter.deleteWhere(spark, url, Pruning.Eq("cat", "c1"))
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 60)
    assert(t.read().where("cat = 'c1'").count() == 0)
    assert(t.liveFiles().size == 2)
    assert(t.countFromStats().contains(60L))
    assert(t.summary("operation") == "delete")
    assert(t.summary("total-records") == "60")
    // the deleted rows are still reachable via time travel
    assert(t.snapshotRelative(-1).read().count() == 90)
  }

  test("partial-file delete is refused (no silent corruption)") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 100L).map(i => (i, "x")).toDF("id", "cat").coalesce(1))
    val e = intercept[UnsupportedOperationException] {
      IcebergWriter.deleteWhere(spark, url, Pruning.Gt("id", 50))
    }
    assert(e.getMessage.contains("row-level delete"))
    // table unchanged
    assert(IcebergTable.load(spark, url).read().count() == 100)
  }

  test("delete matching nothing is a no-op (no new snapshot)") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema, Seq("cat" -> "identity"))
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("id", "cat"))
    val before = IcebergTable.load(spark, url).version
    IcebergWriter.deleteWhere(spark, url, Pruning.Eq("cat", "zzz"))
    assert(IcebergTable.load(spark, url).version == before)
  }

  test("bounds-based delete on an unpartitioned column works when files split cleanly") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 50L).map(i => (i, "a")).toDF("id", "cat").coalesce(1))
    IcebergWriter.append(spark, url,
      (100L to 150L).map(i => (i, "b")).toDF("id", "cat").coalesce(1))
    IcebergWriter.deleteWhere(spark, url, Pruning.GtEq("id", 100))
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 50)
    assert(t.read().agg(org.apache.spark.sql.functions.max("id")).head.getLong(0) == 50L)
  }
}
