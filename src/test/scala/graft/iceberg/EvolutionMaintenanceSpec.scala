package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side schema evolution (add/rename/drop, id-resolved) and table
  * maintenance (compaction, snapshot expiration with physical cleanup). */
class EvolutionMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_ice_evo").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  test("addColumn: old files read null, new files carry data, time travel intact") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "cat"))
    IcebergWriter.addColumn(spark, url, "score", "double")
    val t1 = IcebergTable.load(spark, url)
    assert(t1.schema.fieldNames.toSeq == Seq("k", "cat", "score"))
    // pre-evolution file reads back null for the new column
    assert(t1.read().select("score").collect().head.isNullAt(0))
    // new appends carry the column
    IcebergWriter.append(spark, url,
      Seq((2L, "b", 0.5)).toDF("k", "cat", "score"))
    val t2 = IcebergTable.load(spark, url)
    val rows = t2.read().orderBy("k").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 0.5)
    // time travel to the pre-evolution snapshot shows the OLD schema
    assert(t2.snapshotRelative(-1).schema.fieldNames.toSeq == Seq("k", "cat"))
  }

  test("renameColumn keeps data via id resolution; dropColumn hides it") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "x"), (2L, "y")).toDF("k", "cat"))
    IcebergWriter.renameColumn(spark, url, "cat", "category")
    val t = IcebergTable.load(spark, url)
    assert(t.schema.fieldNames.toSeq == Seq("k", "category"))
    assert(t.read().orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (2L, "y")))
    // writes under the new name land in the same field id
    IcebergWriter.append(spark, url, Seq((3L, "z")).toDF("k", "category"))
    assert(IcebergTable.load(spark, url).read().count() == 3)

    IcebergWriter.dropColumn(spark, url, "category")
    val t2 = IcebergTable.load(spark, url)
    assert(t2.schema.fieldNames.toSeq == Seq("k"))
    assert(t2.read().count() == 3)
  }

  test("compact folds small files and applied position deletes into one replace snapshot") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    // many small files + a row-level delete
    (1 to 5).foreach(i => IcebergWriter.append(spark, url,
      ((i * 10L) until (i * 10L + 10L)).map(j => (j, s"c$i")).toDF("k", "cat")
        .repartition(3)))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 25L))
    val before = IcebergTable.load(spark, url)
    assert(before.liveFiles().size >= 15)
    assert(before.positionDeleteFiles.nonEmpty)
    val rowsBefore = before.read().orderBy("k").as[(Long, String)].collect().toSeq

    Maintenance.compact(spark, url, targetFiles = Some(2))
    val after = IcebergTable.load(spark, url)
    assert(after.summary("operation") == "replace")
    assert(after.liveFiles().size == 2, s"files: ${after.liveFiles().size}")
    // delete manifests are fully applied and dropped -> plain scans again
    assert(after.positionDeleteFiles.isEmpty)
    assert(after.read().orderBy("k").as[(Long, String)].collect().toSeq == rowsBefore)
    assert(after.countFromStats().contains(rowsBefore.size.toLong))
    // pre-compaction snapshot still time travels
    assert(after.snapshotRelative(-1).read().count() == rowsBefore.size)
    // and the raw batch source works again (no MOR needed)
    assert(spark.read.format("graft-iceberg").load(url).count() == rowsBefore.size)
  }

  test("expireSnapshots trims history and physically deletes unreferenced files") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    (1 to 4).foreach(i => IcebergWriter.append(spark, url,
      Seq((i.toLong, s"c$i")).toDF("k", "cat").coalesce(1)))
    Maintenance.compact(spark, url, targetFiles = Some(1))
    val before = IcebergTable.load(spark, url)
    assert(before.snapshots.size == 5)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(url).getFileSystem(conf)
    def parquetCount: Int = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$url/data"), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    assert(parquetCount == 5) // 4 small + 1 compacted

    Maintenance.expireSnapshots(spark, url, keepLast = 1)
    val after = IcebergTable.load(spark, url)
    assert(after.snapshots.size == 1)
    assert(after.read().count() == 4) // data intact through the kept snapshot
    assert(parquetCount == 1, s"unreferenced files not cleaned: $parquetCount")
    // expired history is gone
    intercept[Exception](after.snapshotRelative(-1))
  }
}
