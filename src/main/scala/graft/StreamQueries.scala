package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Event-time operators exposed through the driver contract: the streaming
  * transforms run here in batch mode (same code path as readStream). */
object StreamQueries {
  import Queries.t

  /** Tumbling 1-hour window aggregation (streaming-compatible transform). */
  def s1WindowAgg(s: SparkSession, dir: String): DataFrame =
    EventStreams.windowedCounts(t(s, dir, "events"))
      .orderBy("window_start", "event_type")

  /** Per-user session rollup via mapGroupsWithState (batch-mode state).
    * Money accumulates in exact cents so the result is order-independent. */
  def s2Sessionize(s: SparkSession, dir: String): DataFrame =
    EventStreams.sessionize(t(s, dir, "events")).toDF()
      .orderBy("user_id")

  /** SESSION WINDOWS (Spark's dynamic gap-merged windows): per-user
    * sessions closed by 30 min of inactivity — the declarative sibling of
    * s2's explicit state machine, and streaming-append-able under a
    * watermark. The oracle replays the gap semantics as gaps-and-islands
    * SQL (new session exactly when the inactivity gap is REACHED). */
  def s9SessionWindow(s: SparkSession, dir: String): DataFrame =
    EventStreams.sessionWindows(t(s, dir, "events"))
      .orderBy("user_id", "session_start")

  /** CDC MIRROR round trip — the flagship change-data-capture composition:
    * a source Iceberg table evolves through appends, position deletes, and
    * an equality-delete upsert; a real readStream tails its CDC changelog
    * one commit per micro-batch; foreachBatch APPLIES each batch to a
    * mirror table (upsert the inserts, equality-delete the delete-only
    * keys — within a one-commit batch a key with both is an update, which
    * the upsert replaces). The mirror must END UP byte-equal to the
    * source's live state, which the oracle replays from the source's own
    * files (position/equality deletes included). At 100 TB this is the
    * replication topology: per-commit batches, per-batch cost ∝ churn. */
  def s10CdcMirror(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_s10").toString
    val src = s"$tmp/src"
    val dst = s"$tmp/dst"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    IcebergWriter.createTable(s, src, schema)
    IcebergWriter.createTable(s, dst, schema)
    IcebergWriter.append(s, src, (1L to 8L).map(i => (i, "a")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(s, src, (9L to 12L).map(i => (i, "b")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(s, src,
      Pruning.And(Pruning.GtEq("k", 2L), Pruning.Lt("k", 4L)))
    IcebergWriter.upsert(s, src,
      Seq((4L, "u4"), (20L, "u20")).toDF("k", "v").coalesce(1), Seq("k"))

    val stream = s.readStream.format("graft-iceberg")
      .option("stream-mode", "cdc")
      .option("stream-from-earliest", "true")
      .option("max-snapshots-per-trigger", "1")
      .load(src)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ins = batch.filter(col("_change_type") === "insert")
          .select("k", "v")
        val delOnly = batch.filter(col("_change_type") === "delete")
          .select("k").except(ins.select("k"))
        if (!ins.isEmpty) IcebergWriter.upsert(s, dst, ins, Seq("k"))
        if (!delOnly.isEmpty) IcebergWriter.equalityDelete(s, dst, delOnly, Seq("k"))
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()

    IceQueries.dynamicOracle("s10_cdc_mirror") =
      s"SELECT k, v FROM (${IceQueries.duckLiveRows(
        IcebergTable.load(s, src), Seq("k", "v"))}) ORDER BY k"
    IcebergTable.load(s, dst).read().select("k", "v").orderBy("k")
  }

  /** Streaming ingestion into an Iceberg table: a real readStream over the
    * events parquet, one append snapshot per micro-batch, exactly-once via
    * the batch id recorded in snapshot summaries. */
  def s3IcebergSink(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import graft.streaming.IcebergSink
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_s3sink").toString
    val url = s"$tmp/tbl"
    val events = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType))))
    // stage as a streaming file source
    val srcDir = s"$tmp/src"
    events.write.parquet(srcDir)
    val stream = s.readStream.schema(events.schema).parquet(srcDir)
    val q = IcebergSink.start(stream, url, s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    val tb = IcebergTable.load(s, url)
    tb.read().groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** Streaming SOURCE over an Iceberg table: events append in three
    * snapshot batches, then a real readStream tails the table from
    * earliest — each micro-batch is one incremental snapshot range.
    * Losing/duplicating any snapshot's rows breaks the hash match against
    * the same aggregation over the raw events. */
  def s4IcebergSource(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.IcebergWriter
    val tmp = java.nio.file.Files.createTempDirectory("graft_s4src").toString
    val url = s"$tmp/tbl"
    val events = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType))))
    (0 until 3).foreach(i =>
      IcebergWriter.append(s, url, events.filter(col("event_id") % 3 === i)))
    val q = s.readStream.format("graft-iceberg")
      .option("stream-from-earliest", "true")
      .load(url)
      .writeStream.format("memory").queryName("s4_ice_source")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table("s4_ice_source").groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** CDC STREAMING SOURCE (`stream-mode=cdc`): a snapshot range holding an
    * append, a position-delete commit, and an equality-delete upsert
    * streams out as a changelog — one snapshot per micro-batch
    * (`max-snapshots-per-trigger=1`), delete rows included. The DuckDB
    * oracle replays every part from the written bytes: inserts from each
    * commit's added files, position-deleted rows by (file,pos) semi-join,
    * equality-deleted rows by key semi-join over parent-visible rows. */
  def s5CdcSource(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_s5cdc").toString
    val url = s"$tmp/tbl"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, (1L to 8L).map(i => (i, "a")).toDF("k", "v").coalesce(1))
    val from = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.append(s, url, (9L to 12L).map(i => (i, "b")).toDF("k", "v").coalesce(1))
    val snapB = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.deleteRows(s, url,
      Pruning.And(Pruning.GtEq("k", 2L), Pruning.Lt("k", 4L)))
    val snapC = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.upsert(s, url,
      Seq((4L, "u4"), (20L, "u20")).toDF("k", "v").coalesce(1), Seq("k"))
    val t = IcebergTable.load(s, url)
    val snapD = t.currentSnapshot.snapshotId

    def live(id: Long) = t.atSnapshot(id).liveFiles().map(f => t.resolvePath(f.filePath))
    def paths(ps: Seq[String]) =
      ps.map(p => "'" + p.replace("'", "''") + "'").mkString("[", ", ", "]")
    val fileA = live(from)
    val fileB = live(snapB).filterNot(fileA.toSet)
    val addedD = live(snapD).filterNot(live(snapC).toSet)
    val posFiles = t.atSnapshot(snapC).positionDeleteFiles.map(f => t.resolvePath(f.filePath))
    val eqFiles = t.equalityDeleteFiles.map(f => t.resolvePath(f.filePath))
    graft.IceQueries.dynamicOracle("s5_cdc_source") =
      s"""SELECT * FROM (
         |SELECT k, v, 'insert' AS _change_type,
         |  CAST($snapB AS BIGINT) AS _commit_snapshot_id
         |FROM read_parquet(${paths(fileB)})
         |UNION ALL
         |SELECT k, v, 'delete', CAST($snapC AS BIGINT) FROM (
         |  SELECT *, file_row_number AS _fpos,
         |         str_split(filename, '/data/')[-1] AS _fkey
         |  FROM read_parquet(${paths(fileA)}, filename=true, file_row_number=true)
         |) _d WHERE EXISTS (SELECT 1 FROM (
         |  SELECT str_split(file_path, '/data/')[-1] AS _fkey, pos AS _fpos
         |  FROM read_parquet(${paths(posFiles)})) _x
         |  WHERE _x._fkey = _d._fkey AND _x._fpos = _d._fpos)
         |UNION ALL
         |SELECT k, v, 'insert', CAST($snapD AS BIGINT)
         |FROM read_parquet(${paths(addedD)})
         |UNION ALL
         |SELECT k, v, 'delete', CAST($snapD AS BIGINT) FROM (
         |  SELECT *, file_row_number AS _fpos,
         |         str_split(filename, '/data/')[-1] AS _fkey
         |  FROM read_parquet(${paths(fileA ++ fileB)},
         |                    filename=true, file_row_number=true)
         |) _d WHERE NOT EXISTS (SELECT 1 FROM (
         |  SELECT str_split(file_path, '/data/')[-1] AS _fkey, pos AS _fpos
         |  FROM read_parquet(${paths(posFiles)})) _x
         |  WHERE _x._fkey = _d._fkey AND _x._fpos = _d._fpos)
         |  AND k IN (SELECT k FROM read_parquet(${paths(eqFiles)}))
         |) ORDER BY _commit_snapshot_id, _change_type, k""".stripMargin

    val q = s.readStream.format("graft-iceberg")
      .option("stream-mode", "cdc")
      .option("starting-snapshot-id", from.toString)
      .option("max-snapshots-per-trigger", "1")
      .load(url)
      .writeStream.format("memory").queryName("s5_cdc_source")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table("s5_cdc_source")
      .select("k", "v", "_change_type", "_commit_snapshot_id")
      .orderBy("_commit_snapshot_id", "_change_type", "k")
  }

  /** EVENT-TIME CDC CONSUMPTION: the CDC stream's `_commit_timestamp`
    * column drives a real watermarked window aggregation — the shape a
    * downstream materializer uses to batch changes by commit time. Window
    * boundaries depend on wall-clock commit times, so the contract
    * re-aggregates ACROSS windows (deterministic) while the stream itself
    * exercises watermark + window + complete-mode state; per-change-type
    * totals must survive the two-level aggregation exactly. */
  def s6CdcWindowed(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_s6cdc").toString
    val url = s"$tmp/tbl"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, (1L to 8L).map(i => (i, "a")).toDF("k", "v").coalesce(1))
    val from = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.append(s, url, (9L to 14L).map(i => (i, "b")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(s, url,
      Pruning.And(Pruning.GtEq("k", 3L), Pruning.Lt("k", 6L)))
    IcebergWriter.upsert(s, url,
      Seq((6L, "u6"), (30L, "u30")).toDF("k", "v").coalesce(1), Seq("k"))

    // inserts: 6 (snapB) + 2 (upsert); deletes: 3 (position) + 1 (eq k=6)
    graft.IceQueries.dynamicOracle("s6_cdc_windowed") =
      """SELECT 'delete' AS _change_type, CAST(4 AS BIGINT) AS n_changes
        |UNION ALL SELECT 'insert', CAST(8 AS BIGINT)
        |ORDER BY _change_type""".stripMargin

    val q = s.readStream.format("graft-iceberg")
      .option("stream-mode", "cdc")
      .option("starting-snapshot-id", from.toString)
      .option("max-snapshots-per-trigger", "1")
      .load(url)
      .withWatermark("_commit_timestamp", "10 seconds")
      .groupBy(window(col("_commit_timestamp"), "1 minute"), col("_change_type"))
      .count()
      .writeStream.format("memory").queryName("s6_cdc_windowed")
      .outputMode("complete")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table("s6_cdc_windowed")
      .groupBy("_change_type").agg(sum("count").as("n_changes"))
      .orderBy("_change_type")
  }

  /** STREAM-STREAM interval join: two real readStreams over the staged
    * events (views and clicks), watermarked on both sides, joined on
    * user_id within a 60-minute event-time window — the bounded-state
    * attribution join. The oracle replays the interval join as plain SQL
    * in µs arithmetic (lossless: the synthetic timestamps have no
    * sub-µs component). */
  def s7StreamJoin(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_s7join").toString
    val events = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    events.write.parquet(s"$tmp/src")
    def side(tpe: String) = s.readStream.schema(events.schema)
      .parquet(s"$tmp/src").filter(col("event_type") === tpe)
    val q = EventStreams.viewClickJoin(side("view"), side("click"),
        withinMinutes = 60, watermark = true)
      .writeStream.format("memory").queryName("s7_stream_join")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table("s7_stream_join")
      .orderBy("user_id", "view_id", "click_id")
  }

  /** STREAMING DEDUPLICATION: the staged source delivers every fifth event
    * TWICE (a second parquet drop simulating a producer retry / replayed
    * offset range); `dropDuplicatesWithinWatermark` on event_id repairs the
    * stream back to exactly-once with bounded state. The oracle is the raw
    * events table itself — emitting a duplicate (or dropping a distinct
    * event) breaks the row-hash match. */
  def s8StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_s8dedup").toString
    val events = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
    events.write.parquet(s"$tmp/src")
    // the retry batch: identical copies of a fifth of the events
    events.filter(col("event_id") % 5 === 0).write.mode("append").parquet(s"$tmp/src")
    val stream = s.readStream.schema(events.schema).parquet(s"$tmp/src")
    val q = EventStreams.dedupEvents(stream, watermark = true)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .writeStream.format("memory").queryName("s8_stream_dedup")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table("s8_stream_dedup").orderBy("event_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_window_agg" -> (s1WindowAgg _),
    "s2_sessionize" -> (s2Sessionize _),
    "s3_iceberg_sink" -> (s3IcebergSink _),
    "s4_iceberg_source" -> (s4IcebergSource _),
    "s5_cdc_source" -> (s5CdcSource _),
    "s6_cdc_windowed" -> (s6CdcWindowed _),
    "s7_stream_join" -> (s7StreamJoin _),
    "s8_stream_dedup" -> (s8StreamDedup _),
    "s9_session_window" -> (s9SessionWindow _),
    "s10_cdc_mirror" -> (s10CdcMirror _),
  )

  val oracle: Map[String, String] = Map(
    // the sink round-trips events through an Iceberg table; the oracle is
    // the same aggregation over the source — losing or duplicating ANY
    // micro-batch row breaks the hash match
    "s3_iceberg_sink" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type""",
    // the source round-trips events OUT of an Iceberg table as a stream;
    // same oracle shape as the sink: the aggregation over the raw events
    "s4_iceberg_source" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type""",
    "s1_window_agg" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY date_trunc('hour', ts), event_type
      ORDER BY window_start, event_type""",
    // the interval join replayed in µs arithmetic (Spark floors ns→µs;
    // the synthetic timestamps are µs-aligned so the floor is lossless)
    "s7_stream_join" -> """
      SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
      FROM events v JOIN events c ON v.user_id = c.user_id
        AND v.event_type = 'view' AND c.event_type = 'click'
        AND epoch_us(c.ts) >= epoch_us(v.ts)
        AND epoch_us(c.ts) - epoch_us(v.ts) < CAST(3600000000 AS BIGINT)
      ORDER BY v.user_id, view_id, click_id""",
    // the dedup stream saw every fifth event twice; exactly-once repair
    // means the output IS the raw events table
    "s8_stream_dedup" -> """
      SELECT event_id, user_id, event_type, value
      FROM events ORDER BY event_id""",
    "s2_sessionize" -> """
      SELECT user_id, COUNT(*) AS n_events,
        MIN(event_id) AS first_event, MAX(event_id) AS last_event,
        CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM events
      GROUP BY user_id ORDER BY user_id""",
    // session_window gap semantics as gaps-and-islands: a NEW session
    // starts exactly when the inactivity gap is REACHED (Spark merges
    // sessions only on strict overlap, so diff == gap opens a new one)
    "s9_session_window" -> """
      WITH marked AS (
        SELECT user_id, ts, value,
          CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
            OR epoch_us(ts) - epoch_us(LAG(ts) OVER (
                 PARTITION BY user_id ORDER BY ts)) >= CAST(1800000000 AS BIGINT)
          THEN 1 ELSE 0 END AS new_session
        FROM events),
      sess AS (
        SELECT user_id, ts, value,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
      SELECT user_id, MIN(ts) AS session_start,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS session_value
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start""",
  )
}
