package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  val eventsPath = "/root/testdata/sf0.001/events.parquet"

  /** File streaming sources need a directory: stage the events parquet. */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(java.nio.file.Paths.get(eventsPath),
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }

  test("windowed counts as a real streaming query (file source -> memory sink)") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val agg = EventStreams.windowedCounts(stream, watermark = true)
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("graft_stream_test")
      .start()
    try {
      q.processAllAvailable()
      // append mode emits only closed windows (watermark passed); the final
      // windows stay open, so compare against the batch result minus the tail
      val streamed = spark.table("graft_stream_test").count()
      val batch = EventStreams.windowedCounts(
        spark.read.parquet(eventsPath)).count()
      assert(batch > 0)
      assert(streamed <= batch)
      // batch-mode equivalence of the same transform is oracle-checked by
      // the driver (s1_window_agg); here we assert the streaming plan runs
    } finally q.stop()
  }

  test("session windows run as an append-mode streaming query; closed " +
      "sessions match the batch result") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = EventStreams.sessionWindows(stream, watermark = true).writeStream
      .outputMode("append")
      .format("memory")
      .queryName("graft_sesswin_test")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_sesswin_test")
        .select("user_id", "session_start", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      val batch = EventStreams.sessionWindows(spark.read.parquet(eventsPath))
        .select("user_id", "session_start", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(batch.nonEmpty && streamed.nonEmpty)
      // append mode emits only watermark-closed sessions; every emitted
      // session must be exactly a batch session (no partial/merged drift)
      assert(streamed.subsetOf(batch),
        s"streamed sessions must match batch: ${streamed.diff(batch).take(3)}")
    } finally q.stop()
  }

  test("sessionize runs as streaming with update mode") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = EventStreams.sessionize(stream).writeStream
      .outputMode("update")
      .format("memory")
      .queryName("graft_session_test")
      .start()
    try {
      q.processAllAvailable()
      val n = spark.table("graft_session_test").count()
      assert(n > 0)
    } finally q.stop()
  }

  test("asof backward join picks latest right row at-or-before left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 10L, "x"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asofBackward(
        left, right.withColumnRenamed("t", "rt"), "k", "t", "rt", Seq("v"))
      .select("name", "v").collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("e0") == null)      // no right row at/before t=5
    assert(out("e1") == 100.0)     // right at t=10 matches (>= semantics)
    assert(out("e2") == 150.0)     // latest at/before 20
    assert(out("x") == null)       // key 2 has no right rows
  }

  test("streaming dedup drops cross-batch duplicates via bounded state") {
    val t0 = 1700000000000000000L // ns
    def ns(min: Long) = t0 + min * 60L * 1000000000L
    val batch1 = Seq(
      (1L, 100L, "view", 1.5, ns(0)),
      (2L, 100L, "click", 2.5, ns(5)),
      (3L, 101L, "view", 3.5, ns(10)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    // batch 2 replays events 1 and 3 (producer retry) plus one new event
    val batch2 = Seq(
      (1L, 100L, "view", 1.5, ns(0)),
      (3L, 101L, "view", 3.5, ns(10)),
      (4L, 102L, "purchase", 9.9, ns(12)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")

    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    batch1.coalesce(1).write.parquet(s"$dir/src")
    batch2.coalesce(1).write.mode("append").parquet(s"$dir/src")
    // one file per trigger → the replayed ids arrive in a LATER micro-batch
    // and must be dropped by state-store lookup, not intra-batch distinct
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val q = EventStreams.dedupEvents(stream, watermark = true)
      .writeStream.format("memory").queryName("graft_dedup_test")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.table("graft_dedup_test")
        .select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()

    // batch mode: plain dropDuplicates over the same doubled input
    val ids = EventStreams.dedupEvents(batch1.union(batch2))
      .select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("stream-stream interval join over the staged events fixture matches batch") {
    // the same bytes the driver's s7_stream_join runs on — a ts-typing or
    // watermark regression on the REAL fixture fails here, not only in the
    // synthetic-frame test below
    val events = spark.read.parquet(eventsPath)
      .select($"event_id", $"user_id", $"event_type", $"ts")
    val batch = EventStreams.viewClickJoin(
        events.filter($"event_type" === "view"),
        events.filter($"event_type" === "click"), withinMinutes = 60)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    def side(tpe: String) = spark.readStream.schema(events.schema)
      .parquet(eventsDir).filter($"event_type" === tpe)
    val dir = java.nio.file.Files.createTempDirectory("graft_s7fix").toString
    val q = EventStreams.viewClickJoin(side("view"), side("click"),
        withinMinutes = 60, watermark = true)
      .writeStream.format("memory").queryName("graft_s7_fixture")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_s7_fixture")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup over the staged events fixture repairs a replayed batch") {
    val events = spark.read.parquet(eventsPath)
      .select($"event_id", $"user_id", $"event_type", $"value", $"ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_s8fix").toString
    events.coalesce(1).write.parquet(s"$dir/src")
    // the retry batch: a fifth of the events delivered a second time, in a
    // separate file so one-file-per-trigger forces CROSS-batch state dedup
    events.filter($"event_id" % 5 === 0).coalesce(1)
      .write.mode("append").parquet(s"$dir/src")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val q = EventStreams.dedupEvents(stream, watermark = true)
      .writeStream.format("memory").queryName("graft_s8_fixture")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val n = spark.table("graft_s8_fixture")
        .select("event_id").distinct().count()
      val total = spark.table("graft_s8_fixture").count()
      assert(total == events.count()) // exactly-once: no dup, no loss
      assert(n == total)
    } finally q.stop()
  }

  test("stream-stream interval join matches batch, bounds included/excluded") {
    val t0 = 1700000000000000000L // ns
    def ns(min: Long) = t0 + min * 60L * 1000000000L
    val views = Seq(
      (10L, 1L, ns(0)), (11L, 1L, ns(120)), (12L, 2L, ns(0)))
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (20L, 1L, ns(10)),  // inside view 10's hour
      (21L, 1L, ns(70)),  // past view 10's hour, before view 11 → no match
      (22L, 2L, ns(60)),  // exactly at the exclusive bound → no match
      (23L, 2L, ns(30)))  // inside view 12's hour
      .toDF("event_id", "user_id", "ts")
    val expected = Set((1L, 10L, 20L), (2L, 12L, 23L))

    val batch = EventStreams.viewClickJoin(views, clicks)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch == expected)

    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    views.write.parquet(s"$dir/views")
    clicks.write.parquet(s"$dir/clicks")
    def stream(sub: String) = spark.readStream
      .schema(views.schema).parquet(s"$dir/$sub")
    val q = EventStreams.viewClickJoin(
        stream("views"), stream("clicks"), watermark = true)
      .writeStream.format("memory").queryName("graft_ssj_test")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_ssj_test")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == expected)
    } finally q.stop()
  }
}
