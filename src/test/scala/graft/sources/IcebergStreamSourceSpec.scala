package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}

/** Streaming SOURCE over an Iceberg table
  * ([[GraftIcebergMicroBatchStream]]): `spark.readStream` tails append
  * snapshots, offsets checkpoint as snapshot ids, and non-append history
  * refuses loudly. */
class IcebergStreamSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("stream-from-earliest delivers the table, then tails new appends") {
    val dir = fresh("graft_src_stream")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 5L).map(i => (i, "a")).toDF("k", "v"))

    val q = spark.readStream.format("graft-iceberg")
      .option("stream-from-earliest", "true")
      .load(url)
      .writeStream.format("memory").queryName("ice_tail")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM ice_tail").as[Long].collect().sorted.toSeq
        == (1L to 5L))
      // two more appends arrive while the stream runs
      IcebergWriter.append(spark, url, (6L to 8L).map(i => (i, "b")).toDF("k", "v"))
      IcebergWriter.append(spark, url, (9L to 10L).map(i => (i, "c")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM ice_tail").as[Long].collect().sorted.toSeq
        == (1L to 10L))
    } finally q.stop()
  }

  test("default start is the current snapshot: only NEW appends flow") {
    val dir = fresh("graft_src_stream2")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 5L).map(i => (i, "old")).toDF("k", "v"))

    val q = spark.readStream.format("graft-iceberg")
      .load(url)
      .writeStream.format("memory").queryName("ice_tail2")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM ice_tail2").as[Long].head() == 0L)
      IcebergWriter.append(spark, url, (6L to 7L).map(i => (i, "new")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM ice_tail2").as[Long].collect().sorted.toSeq
        == Seq(6L, 7L))
    } finally q.stop()
  }

  test("restart resumes from the checkpointed snapshot offset") {
    val dir = fresh("graft_src_stream3")
    val url = s"$dir/tbl"
    val ckpt = s"$dir/ckpt"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 3L).map(i => (i, "a")).toDF("k", "v"))

    val out = s"$dir/out"
    def run(): Unit = {
      val q = spark.readStream.format("graft-iceberg")
        .option("stream-from-earliest", "true")
        .load(url)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 3L)
    IcebergWriter.append(spark, url, (4L to 6L).map(i => (i, "b")).toDF("k", "v"))
    // second run, same checkpoint: resumes at the recorded snapshot — the
    // exactly-once file sink ends with each row once, no batch-0 replay
    run()
    assert(spark.read.parquet(out).as[(Long, String)].collect().map(_._1)
      .sorted.toSeq == (1L to 6L))
  }

  test("max-snapshots-per-trigger splits the backlog into bounded batches") {
    val dir = fresh("graft_src_stream5")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    (1 to 4).foreach(i =>
      IcebergWriter.append(spark, url,
        Seq((i.toLong, s"b$i")).toDF("k", "v")))

    val q = spark.readStream.format("graft-iceberg")
      .option("stream-from-earliest", "true")
      .option("max-snapshots-per-trigger", "1")
      .load(url)
      .writeStream.format("memory").queryName("ice_tail5")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM ice_tail5").as[Long].collect().sorted.toSeq
        == (1L to 4L))
      // the backlog of 4 snapshots drained as (at least) 4 bounded batches,
      // not one giant catch-up batch
      val nonEmptyBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmptyBatches >= 4,
        s"expected >=4 rate-limited batches, saw $nonEmptyBatches")
    } finally q.stop()
  }

  test("stream-from-earliest refuses live row-level deletes; compaction unblocks") {
    val dir = fresh("graft_src_stream6")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 10L).map(i => (i, "a")).toDF("k", "v"))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 3L))

    def run(ckpt: String): Seq[Long] = {
      val q = spark.readStream.format("graft-iceberg")
        .option("stream-from-earliest", "true")
        .load(url)
        .writeStream.format("memory").queryName("ice_tail6")
        .option("checkpointLocation", s"$dir/$ckpt")
        .start()
      try { q.processAllAvailable();
        spark.sql("SELECT k FROM ice_tail6").as[Long].collect().sorted.toSeq }
      finally q.stop()
    }
    // whole-file catch-up over a deleted-from table would resurrect k=3
    val e = intercept[Exception] { run("ckpt1") }
    assert(e.getMessage != null)
    // compaction folds the deletes; the stream then delivers the LIVE rows
    graft.iceberg.Maintenance.compact(spark, url, targetFiles = Some(1))
    assert(run("ckpt2") == (1L to 10L).filterNot(_ == 3L))
  }

  test("max-rows-per-trigger bounds each micro-batch by added-records") {
    val dir = fresh("graft_src_maxrows")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    (1 to 4).foreach(i => IcebergWriter.append(spark, url,
      ((i * 10L) until (i * 10L + 5)).map(j => (j, s"b$i")).toDF("k", "v")))

    val q = spark.readStream.format("graft-iceberg")
      .option("stream-from-earliest", "true")
      .option("max-rows-per-trigger", "6")
      .load(url)
      .writeStream.format("memory").queryName("ice_maxrows")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // 4 snapshots of 5 rows with a 6-row cap → one snapshot per batch
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 4, s"expected 4 bounded batches, got ${
        batches.map(_.numInputRows).mkString(",")}")
      assert(batches.forall(_.numInputRows == 5))
    } finally q.stop()
    assert(spark.sql("SELECT k FROM ice_maxrows").as[Long].collect().sorted.toSeq
      == (1 to 4).flatMap(i => (i * 10L) until (i * 10L + 5)))
  }

  test("Trigger.AvailableNow honours the engine-supplied ReadLimit and terminates") {
    val dir = fresh("graft_src_avnow")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    (1 to 4).foreach(i => IcebergWriter.append(spark, url,
      ((i * 10L) until (i * 10L + 5)).map(j => (j, s"b$i")).toDF("k", "v")))

    val q = spark.readStream.format("graft-iceberg")
      .option("stream-from-earliest", "true")
      .option("max-snapshots-per-trigger", "1")
      .load(url)
      .writeStream.format("memory").queryName("ice_avnow")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
    } finally q.stop()
    assert(spark.sql("SELECT k FROM ice_avnow").as[Long].collect().sorted.toSeq
      == (1 to 4).flatMap(i => (i * 10L) until (i * 10L + 5)))
  }

  test("stream-mode=cdc matches the batch changelog, delete rows included") {
    val dir = fresh("graft_src_cdc")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 8L).map(i => (i, "a")).toDF("k", "v").coalesce(1))
    val from = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    IcebergWriter.append(spark, url, (9L to 12L).map(i => (i, "b")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(spark, url,
      Pruning.And(Pruning.GtEq("k", 2L), Pruning.Lt("k", 4L)))
    IcebergWriter.upsert(spark, url,
      Seq((4L, "u4"), (20L, "u20")).toDF("k", "v").coalesce(1), Seq("k"))

    val q = spark.readStream.format("graft-iceberg")
      .option("stream-mode", "cdc")
      .option("starting-snapshot-id", from.toString)
      .option("max-snapshots-per-trigger", "1") // one snapshot per batch
      .load(url)
      .writeStream.format("memory").queryName("ice_cdc")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()

    val t = IcebergTable.load(spark, url)
    val streamed = spark.table("ice_cdc")
      .select("k", "v", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    val batch = t.changelog(from, t.currentSnapshot.snapshotId)
      .select("k", "v", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    assert(streamed == batch)
    // _commit_timestamp carries the committing snapshot's metadata
    // timestamp, identically in the stream and the batch changelog
    val tsBySnap = t.metadata.snapshots
      .map(s => s.snapshotId -> s.timestampMs * 1000L).toMap
    spark.table("ice_cdc")
      .select(col("_commit_snapshot_id"), unix_micros(col("_commit_timestamp")))
      .collect()
      .foreach(r => assert(r.getLong(1) == tsBySnap(r.getLong(0)),
        s"stream timestamp mismatch for snapshot ${r.getLong(0)}"))
    val batchTs = t.changelog(from, t.currentSnapshot.snapshotId)
      .select(col("_commit_snapshot_id"), unix_micros(col("_commit_timestamp")))
      .collect()
    batchTs.foreach(r => assert(r.getLong(1) == tsBySnap(r.getLong(0))))
    // spot-check the semantics, not just self-consistency
    val byType = streamed.groupBy(_._3)
    assert(byType("delete").map(r => (r._1, r._2)).sorted
      == Seq((2L, "a"), (3L, "a"), (4L, "a")))
    assert(byType("insert").map(_._1).sorted == Seq(4L, 9L, 10L, 11L, 12L, 20L))
  }

  test("cdc catch-up batch emits current live rows as inserts") {
    val dir = fresh("graft_src_cdc2")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 6L).map(i => (i, "a")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 5L))
    IcebergWriter.upsert(spark, url,
      Seq((1L, "u1")).toDF("k", "v").coalesce(1), Seq("k"))

    val q = spark.readStream.format("graft-iceberg")
      .option("stream-mode", "cdc")
      .option("stream-from-earliest", "true")
      .load(url)
      .writeStream.format("memory").queryName("ice_cdc2")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("ice_cdc2")
      .select("k", "v", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    // live rows only (5 pos-deleted, 1 superseded by the upsert), all inserts
    assert(rows.map(r => (r._1, r._2, r._3)) == Seq(
      (1L, "u1", "insert"), (2L, "a", "insert"), (3L, "a", "insert"),
      (4L, "a", "insert"), (6L, "a", "insert")))
  }

  test("a delete snapshot in the pending range refuses") {
    val dir = fresh("graft_src_stream4")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 5L).map(i => (i, "a")).toDF("k", "v"))
    val q = spark.readStream.format("graft-iceberg")
      .load(url)
      .writeStream.format("memory").queryName("ice_tail4")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 2L))
      IcebergWriter.append(spark, url, Seq((6L, "b")).toDF("k", "v"))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage != null)
      ()
    } finally q.stop()

    val t = IcebergTable.load(spark, url)
    assert(t.snapshots.size >= 3) // table itself is fine; only the tail broke
  }

  test("an expired checkpointed start snapshot refuses instead of replaying") {
    val dir = fresh("graft_src_expired")
    val url = s"$dir/tbl"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 3L).map(i => (i, "a")).toDF("k", "v"))
    IcebergWriter.append(spark, url, (4L to 6L).map(i => (i, "b")).toDF("k", "v"))

    // memory sink can't recover from a checkpoint, so use a file sink
    def start() = spark.readStream.format("graft-iceberg")
      .option("stream-from-earliest", "true")
      .load(url)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(s"$dir/out").select("k").as[Long]
      .collect().sorted.toSeq == (1L to 6L))

    // the checkpointed offset (snapshot 2) gets expired out of metadata
    IcebergWriter.append(spark, url, (7L to 9L).map(i => (i, "c")).toDF("k", "v"))
    graft.iceberg.Maintenance.expireSnapshots(spark, url, keepLast = 1)

    // a restart must NOT silently treat the whole reachable chain as pending
    // (that would re-emit rows 1..6); it refuses with a actionable message
    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: messages(t.getCause)
    assert(messages(e).exists(_.contains("no longer in table metadata")),
      s"unexpected failure chain: ${messages(e).mkString(" | ")}")
  }
}
