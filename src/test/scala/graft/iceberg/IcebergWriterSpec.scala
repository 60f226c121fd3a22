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

  test("large append harvests footer stats via a distributed job, not a driver loop") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq("id" -> "bucket[32]"))
    // 32 buckets over 4 tasks → ≥32 files in one commit
    IcebergWriter.append(spark, url,
      (1L to 2000L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "score"))
    val t = IcebergTable.load(spark, url)
    val files = t.liveFiles()
    assert(files.size >= 32, s"expected >=32 files, got ${files.size}")
    // every file carries footer-derived bounds and exact record counts
    assert(files.forall(_.lowerBounds.nonEmpty))
    assert(files.map(_.recordCount).sum == 2000L)
    assert(t.countFromStats().contains(2000L))
    // bounds are correct: a pruned point-read returns exactly one row
    assert(t.read(filters = Seq(Seq(("id", "==", 1234)))).count() == 1)
  }

  test("collectStats distributed path agrees with the driver path") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 500L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "score")
        .repartition(12)) // 12 files > threshold → distributed harvest
    val t = IcebergTable.load(spark, url)
    val files = t.liveFiles()
    assert(files.size == 12)
    // recompute the same stats on the driver and compare bound bytes
    val conf = spark.sessionState.newHadoopConf()
    val driverSide = IcebergWriter.collectStats(spark,
      files.take(1).map(f => (t.resolvePath(f.filePath), f.fileSizeInBytes)),
      t.iceSchema, conf)
    val (_, st) = driverSide.head
    val manifestSide = files.find(f => t.resolvePath(f.filePath) == driverSide.head._1).get
    assert(st.recordCount == manifestSide.recordCount)
    assert(st.lowerBounds.keySet == manifestSide.lowerBounds.keySet)
    st.lowerBounds.foreach { case (id, b) =>
      assert(java.util.Arrays.equals(b, manifestSide.lowerBounds(id)), s"field $id lower")
    }
  }
}
