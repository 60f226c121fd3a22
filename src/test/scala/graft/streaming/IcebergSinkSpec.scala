package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergTable, IcebergWriter}

/** Streaming ingestion into an Iceberg table: one append snapshot per
  * micro-batch, replay-protected via the batch id in the snapshot summary. */
class IcebergSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("streaming query appends micro-batches as snapshots") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val srcDir = s"$dir/src"
    val url = s"$dir/tbl"
    val ckpt = s"$dir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    IcebergWriter.createTable(spark, url, schema)

    // stage two source files -> the file source reads them as batches
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1)
      .write.mode("append").parquet(srcDir)
    Seq((3L, "c")).toDF("id", "name").coalesce(1)
      .write.mode("append").parquet(srcDir)

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = IcebergSink.start(stream, url, ckpt)
    try q.processAllAvailable() finally q.stop()

    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 3)
    assert(t.metadata.snapshots.nonEmpty)
    assert(t.metadata.snapshots.forall(_.summary.contains(IcebergSink.BatchIdProp)))

    // restart from the same checkpoint: nothing new -> no new snapshots
    val nSnaps = t.snapshots.size
    val q2 = IcebergSink.start(spark.readStream.schema(schema).parquet(srcDir), url, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(IcebergTable.load(spark, url).snapshots.size == nSnaps)

    // new data arrives -> exactly one more snapshot
    Seq((4L, "d")).toDF("id", "name").coalesce(1)
      .write.mode("append").parquet(srcDir)
    val q3 = IcebergSink.start(spark.readStream.schema(schema).parquet(srcDir), url, ckpt)
    try q3.processAllAvailable() finally q3.stop()
    val t3 = IcebergTable.load(spark, url)
    assert(t3.read().count() == 4)
  }

  test("statsEveryBatches keeps NDV statistics fresh via the incremental path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_stats").toString
    val srcDir = s"$dir/src"
    val url = s"$dir/tbl"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    IcebergWriter.createTable(spark, url, schema)
    (1L to 200L).map(i => (i, s"n${i % 9}")).toDF("id", "name").coalesce(1)
      .write.mode("append").parquet(srcDir)

    val q = IcebergSink.start(spark.readStream.schema(schema).parquet(srcDir),
      url, s"$dir/ckpt", statsEveryBatches = 1)
    try q.processAllAvailable() finally q.stop()
    val t = IcebergTable.load(spark, url)
    val ndvs = graft.iceberg.TableStatistics.ndvFor(t, t.currentSnapshot.snapshotId)
    val idField = t.iceSchema.fields.find(_.name == "id").get.id
    assert(ndvs.nonEmpty, "streaming sink must register statistics")
    assert(math.abs(ndvs(idField) - 200L) <= 10, s"id ndv=${ndvs.get(idField)}")

    // a later batch refreshes them INCREMENTALLY (sketch union, not a
    // full-table pass)
    (201L to 300L).map(i => (i, s"n${i % 9}")).toDF("id", "name").coalesce(1)
      .write.mode("append").parquet(srcDir)
    val before = graft.iceberg.TableStatistics.incrementalUnions.get()
    val q2 = IcebergSink.start(spark.readStream.schema(schema).parquet(srcDir),
      url, s"$dir/ckpt", statsEveryBatches = 1)
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.iceberg.TableStatistics.incrementalUnions.get() > before,
      "the follow-up refresh must take the sketch-union path")
    val t2 = IcebergTable.load(spark, url)
    val ndvs2 = graft.iceberg.TableStatistics.ndvFor(t2, t2.currentSnapshot.snapshotId)
    assert(math.abs(ndvs2(idField) - 300L) <= 15, s"id ndv=${ndvs2.get(idField)}")
  }

  test("a failed advisory stats refresh never fails the streaming query") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_statsfail").toString
    val srcDir = s"$dir/src"
    val url = s"$dir/tbl"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 50L).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1))
    graft.iceberg.Maintenance.computeStatistics(spark, url)
    // corrupt the registered puffin: the refresh will THROW (by design —
    // a corrupt prior is a fault, not a fallback), but stats are advisory
    // optimizer input, so ingestion must continue and the batch stays
    // committed
    val t0 = IcebergTable.load(spark, url)
    val puffin = t0.resolvePath(t0.metadata.statistics.head.path)
    java.nio.file.Files.write(java.nio.file.Paths.get(puffin),
      "PFA1PFA1junk".getBytes ++ java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(4).putInt(0).put("PFA1".getBytes).array())
    // local-fs checksum sidecar would fail the read even earlier with a
    // different exception; either way the refresh throws inside the sink
    val crc = new java.io.File(new java.io.File(puffin).getParent,
      "." + new java.io.File(puffin).getName + ".crc")
    if (crc.exists) crc.delete()

    (51L to 80L).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1)
      .write.mode("append").parquet(srcDir)
    val q = IcebergSink.start(spark.readStream.schema(schema).parquet(srcDir),
      url, s"$dir/ckpt", statsEveryBatches = 1)
    try q.processAllAvailable() finally q.stop()
    assert(q.exception.isEmpty,
      s"stats-refresh failure must not fail the query: ${q.exception}")
    assert(IcebergTable.load(spark, url).read().count() == 80,
      "the data batch must stay committed")
  }

  test("streaming WAP: batches stage on a branch, publish via fastForward") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_wap").toString
    val srcDir = s"$dir/src"
    val url = s"$dir/tbl"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "base")).toDF("id", "name"))

    Seq((2L, "s2")).toDF("id", "name").coalesce(1).write.mode("append").parquet(srcDir)
    Seq((3L, "s3")).toDF("id", "name").coalesce(1).write.mode("append").parquet(srcDir)
    val q = IcebergSink.start(spark.readStream.schema(schema).parquet(srcDir),
      url, s"$dir/ckpt", branch = Some("audit"))
    try q.processAllAvailable() finally q.stop()

    val t = IcebergTable.load(spark, url)
    // main sees only the base row; every staged batch is on the branch
    assert(t.read().as[(Long, String)].collect().map(_._1).toSeq == Seq(1L))
    assert(t.atBranch("audit").read().as[(Long, String)].collect()
      .map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
    // replay guard holds across staged snapshots: restart ingests nothing
    val nSnaps = t.snapshots.size
    val q2 = IcebergSink.start(spark.readStream.schema(schema).parquet(srcDir),
      url, s"$dir/ckpt", branch = Some("audit"))
    try q2.processAllAvailable() finally q2.stop()
    assert(IcebergTable.load(spark, url).snapshots.size == nSnaps)

    IcebergWriter.fastForward(spark, url, "audit")
    assert(IcebergTable.load(spark, url).read().count() == 3)
  }

  test("streaming CDC upsert: later batches supersede earlier keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsink").toString
    val srcDir = s"$dir/src"
    val url = s"$dir/tbl"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    IcebergWriter.createTable(spark, url, schema)

    Seq((1L, "v1"), (2L, "v1")).toDF("id", "name").coalesce(1)
      .write.mode("append").parquet(srcDir)
    val q = IcebergSink.startUpsert(
      spark.readStream.schema(schema).parquet(srcDir), url, s"$dir/ckpt", Seq("id"))
    try q.processAllAvailable() finally q.stop()

    // a second batch updates id=2 and inserts id=3
    Seq((2L, "v2"), (3L, "v2")).toDF("id", "name").coalesce(1)
      .write.mode("append").parquet(srcDir)
    val q2 = IcebergSink.startUpsert(
      spark.readStream.schema(schema).parquet(srcDir), url, s"$dir/ckpt", Seq("id"))
    try q2.processAllAvailable() finally q2.stop()

    val t = IcebergTable.load(spark, url)
    val got = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "v1"), (2L, "v2"), (3L, "v2")))
    // CDC commits are O(batch): no data file was rewritten
    assert(t.equalityDeleteFiles.nonEmpty)
    // compaction folds the CDC deletes back to plain scans
    graft.iceberg.Maintenance.compact(spark, url, targetFiles = Some(1))
    val tc = IcebergTable.load(spark, url)
    assert(tc.liveDeleteFiles.isEmpty)
    assert(tc.read().as[(Long, String)].collect().sortBy(_._1).toSeq == got)
  }

  test("replayed batch id is skipped (exactly-once)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    val batch = Seq((1L, "a")).toDF("id", "name")
    IcebergSink.appendBatch(url, batch, batchId = 0L)
    IcebergSink.appendBatch(url, batch, batchId = 0L) // replay -> skipped
    IcebergSink.appendBatch(url, batch, batchId = 1L)
    val t = IcebergTable.load(spark, url)
    assert(t.snapshots.size == 2)
    assert(t.read().count() == 2)
  }
}
