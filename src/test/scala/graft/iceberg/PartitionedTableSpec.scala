package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end hidden partitioning: write a partitioned table with our own
  * writer, then verify partition values land in manifests, manifest-tier
  * summaries prune, derived-partition predicates rewrite through transforms,
  * and uniquePartitions answers from metadata only — the capabilities the
  * reference implements but its own fixture (unpartitioned) never exercises. */
class PartitionedTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_ice_part").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("cat", StringType),
    StructField("ts", TimestampNTZType), StructField("v", DoubleType)))

  private def sampleDf = {
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    (1L to 300L).map { i =>
      (i, s"cat${i % 3}", base.plusDays(i % 10), i.toDouble)
    }.toDF("id", "cat", "ts", "v")
  }

  test("identity-partitioned table: values in manifests, pruning, uniquePartitions") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema, Seq("cat" -> "identity"))
    IcebergWriter.append(spark, url, sampleDf)
    val t = IcebergTable.load(spark, url)

    // data files keep ALL columns (Iceberg, not Hive, layout)
    assert(t.read().columns.toSeq == Seq("id", "cat", "ts", "v"))
    assert(t.read().count() == 300)
    assert(t.read().where("cat = 'cat1'").count() == 100)

    // per-file partition values present and typed
    val files = t.liveFiles()
    assert(files.size == 3)
    assert(files.flatMap(_.partition.get("cat")).toSet == Set("cat0", "cat1", "cat2"))

    // partition-value pruning (tier 2) drops files before the scan
    val ctx = Pruning.Context(
      t.iceSchema.fields.map(f =>
        f.name -> Pruning.FieldInfo(f.id, f.name, f.icebergTypeString)).toMap,
      t.partitionSpec)
    val kept = files.filter(f => Pruning.fileMightMatch(Pruning.Eq("cat", "cat1"), f, ctx))
    assert(kept.size == 1)

    // metadata-only partition listing (ice.py:266-282 parity)
    assert(t.uniquePartitions() == Map("cat" -> Seq("cat0", "cat1", "cat2")))

    // filtered read returns correct rows through the pruned scan
    val rows = t.read(filters = Seq(Seq(("cat", "==", "cat2")))).count()
    assert(rows == 100)
  }

  test("bucket-partitioned table: Eq prunes via derived-partition rewrite") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema, Seq("id" -> "bucket[4]"))
    IcebergWriter.append(spark, url, sampleDf)
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 300)

    val files = t.liveFiles()
    assert(files.size == 4) // one file per bucket
    val buckets = files.flatMap(_.partition.get("id_bucket")).map(_.asInstanceOf[Long]).toSet
    assert(buckets == Set(0L, 1L, 2L, 3L))

    // Eq on the SOURCE column prunes to exactly the file of bucket(id)
    val ctx = Pruning.Context(
      t.iceSchema.fields.map(f =>
        f.name -> Pruning.FieldInfo(f.id, f.name, f.icebergTypeString)).toMap,
      t.partitionSpec)
    val kept = files.filter(f => Pruning.fileMightMatch(Pruning.Eq("id", 42), f, ctx))
    assert(kept.size == 1)
    val expectedBucket = Transforms.Bucket(4)(42L, "long").get
    assert(kept.head.partition("id_bucket") == expectedBucket)

    // range predicates must NOT prune through a bucket (soundness)
    val keptRange = files.filter(f => Pruning.fileMightMatch(Pruning.Gt("id", 250), f, ctx))
    assert(keptRange.size == 4)

    // and the filtered read is row-correct
    assert(t.read(filters = Seq(Seq(("id", "==", 42)))).count() == 1)
  }

  test("day-partitioned table: time-range pruning via manifest summaries") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema, Seq("ts" -> "day"))
    IcebergWriter.append(spark, url, sampleDf)
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 300)

    val files = t.liveFiles()
    assert(files.size == 10) // 10 distinct days
    // manifest summaries carry day bounds → manifest-tier pruning works
    val mf = t.manifestList.head
    assert(mf.partitions.nonEmpty)
    assert(mf.partitions.head.lowerBound.isDefined)

    val ctx = Pruning.Context(
      t.iceSchema.fields.map(f =>
        f.name -> Pruning.FieldInfo(f.id, f.name, f.icebergTypeString)).toMap,
      t.partitionSpec)
    // equality on a single day keeps one file
    val kept = files.filter(f => Pruning.fileMightMatch(
      Pruning.Eq("ts", "2024-01-05T00:00:00"), f, ctx))
    assert(kept.size == 1)
    // at exactly midnight the boundary day qualifies: days 8, 9, 10
    val keptMidnight = files.filter(f => Pruning.fileMightMatch(
      Pruning.GtEq("ts", "2024-01-08T00:00:00"), f, ctx))
    assert(keptMidnight.size == 3)
    // rows are all at 00:00, so COLUMN bounds (tier 3) prune the boundary
    // day for a 12:00 cut even though the lossy day transform alone would
    // keep it — the tiers compose
    val keptNoon = files.filter(f => Pruning.fileMightMatch(
      Pruning.GtEq("ts", "2024-01-08T12:00:00"), f, ctx))
    assert(keptNoon.size == 2)
  }

  test("month-partitioned table: E2E write, read, and range pruning") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema, Seq("ts" -> "month"))
    val base = java.time.LocalDateTime.of(2023, 11, 15, 6, 30)
    IcebergWriter.append(spark, url,
      (1L to 120L).map(i => (i, s"c${i % 2}", base.plusMonths(i % 4), i.toDouble))
        .toDF("id", "cat", "ts", "v"))
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 120)
    val files = t.liveFiles()
    assert(files.size == 4) // Nov 23, Dec 23, Jan 24, Feb 24
    // month transform values: months since 1970-01
    val monthVals = files.flatMap(_.partition.get("ts_month")).map(_.asInstanceOf[Long]).sorted
    assert(monthVals == Seq(646L, 647L, 648L, 649L))
    val ctx = Pruning.Context(
      t.iceSchema.fields.map(f =>
        f.name -> Pruning.FieldInfo(f.id, f.name, f.icebergTypeString)).toMap,
      t.partitionSpec)
    // range predicate prunes via the order-preserving month transform
    val kept = files.filter(f => Pruning.fileMightMatch(
      Pruning.GtEq("ts", "2024-01-01T00:00:00"), f, ctx))
    assert(kept.size == 2)
    // pruned read returns the right rows
    assert(t.read(filters = Seq(Seq(("ts", ">=", "2024-01-01T00:00:00")))).count() ==
      t.read().where("ts >= '2024-01-01'").count())
    // metadata-only month listing
    assert(t.uniquePartitions(Some("ts_month"))("ts_month").size == 4)
  }

  test("partitionStats: metadata-only per-partition file/record/byte counts") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType))),
      partitions = Seq("cat" -> "identity"))
    IcebergWriter.append(spark, url,
      ((1L to 6L).map(i => (i, "a")) ++ (7L to 9L).map(i => (i, "b")))
        .toDF("k", "cat"))
    val t = IcebergTable.load(spark, url)
    val stats = t.partitionStats().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(stats.map(s => (s._1, s._2, s._3)).toSeq
      == Seq(("a", 1L, 6L), ("b", 1L, 3L)))
    assert(stats.forall(s => s._4 > 0L && !s._5))

    // live row-level deletes flip the upper-bound flag; raw counts persist
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 2L))
    val t2 = IcebergTable.load(spark, url)
    val after = t2.partitionStats().collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(4))).sortBy(_._1)
    assert(after.toSeq == Seq(("a", 6L, true), ("b", 3L, true)),
      "raw manifest counts with has_live_deletes = true (MOR upper bound)")
  }

  test("year-partitioned table: E2E write, read, and range pruning") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema, Seq("ts" -> "year"))
    val base = java.time.LocalDateTime.of(2021, 6, 1, 12, 0)
    IcebergWriter.append(spark, url,
      (1L to 90L).map(i => (i, s"c${i % 2}", base.plusYears(i % 3), i.toDouble))
        .toDF("id", "cat", "ts", "v"))
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 90)
    val files = t.liveFiles()
    assert(files.size == 3) // 2021, 2022, 2023
    val yearVals = files.flatMap(_.partition.get("ts_year")).map(_.asInstanceOf[Long]).sorted
    assert(yearVals == Seq(51L, 52L, 53L)) // years since 1970
    val ctx = Pruning.Context(
      t.iceSchema.fields.map(f =>
        f.name -> Pruning.FieldInfo(f.id, f.name, f.icebergTypeString)).toMap,
      t.partitionSpec)
    val kept = files.filter(f => Pruning.fileMightMatch(
      Pruning.Lt("ts", "2022-01-01T00:00:00"), f, ctx))
    assert(kept.size == 1)
    assert(t.read(filters = Seq(Seq(("ts", "<", "2022-01-01T00:00:00")))).count() == 30)
  }
}
