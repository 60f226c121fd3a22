package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Write-path round trip: tables created and appended by IcebergWriter must
  * be readable by IcebergTable with working time travel and stats pruning. */
class IcebergWriterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_ice_write").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("create produces an empty table that errors on snapshot access") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    val t = IcebergTable.load(spark, url)
    assert(t.version == 1)
    assert(t.metadata.currentSnapshotId == -1L)
    intercept[IllegalStateException](t.latestSnapshot) // reference parity
  }

  test("append then read back; second append chains snapshots") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "score"))
    val t1 = IcebergTable.load(spark, url)
    assert(t1.version == 2)
    assert(t1.read().count() == 2)
    assert(t1.countFromStats().contains(2L))

    IcebergWriter.append(spark, url,
      Seq((3L, "c", 3.0)).toDF("id", "name", "score"))
    val t2 = IcebergTable.load(spark, url)
    assert(t2.version == 3)
    assert(t2.read().count() == 3)
    assert(t2.countFromStats().contains(3L))
    assert(t2.summary("operation") == "append")
    assert(t2.summary("total-records") == "3")
    // time travel back to the first snapshot
    assert(t2.snapshotRelative(-1).read().count() == 2)
    // snapshot chain is linked
    assert(t2.latestSnapshot.parentSnapshotId ==
      Some(t2.snapshotRelative(-1).currentSnapshot.snapshotId))
  }

  test("footer-derived bounds drive file pruning on written tables") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    // two appends with disjoint id ranges → two files with disjoint bounds
    IcebergWriter.append(spark, url,
      (1L to 100L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "score").coalesce(1))
    IcebergWriter.append(spark, url,
      (1000L to 1100L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "score").coalesce(1))
    val t = IcebergTable.load(spark, url)
    val ctx = Pruning.Context(
      t.iceSchema.fields.map(f =>
        f.name -> Pruning.FieldInfo(f.id, f.name, f.icebergTypeString)).toMap,
      t.partitionSpec)
    val all = t.liveFiles()
    assert(all.size == 2)
    assert(all.forall(_.lowerBounds.nonEmpty), "bounds missing from written manifests")
    val kept = all.filter(f => Pruning.fileMightMatch(Pruning.Gt("id", 500), f, ctx))
    assert(kept.size == 1, "stats pruning failed on written bounds")
    // string bounds work too: "zzz" is lexicographically beyond both ranges
    val keptName = all.filter(f => Pruning.fileMightMatch(Pruning.Eq("name", "zzz"), f, ctx))
    assert(keptName.isEmpty)
    // and the pruned read returns correct rows
    assert(t.read(filters = Seq(Seq(("id", ">", 1050)))).count() == 50)
  }

  test("written table is readable via the graft-iceberg source") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      Seq((7L, "x", 0.5)).toDF("id", "name", "score"))
    val df = spark.read.format("graft-iceberg").load(url)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(7L))
  }
}
