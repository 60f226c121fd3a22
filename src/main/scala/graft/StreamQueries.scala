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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_window_agg" -> (s1WindowAgg _),
    "s2_sessionize" -> (s2Sessionize _),
    "s3_iceberg_sink" -> (s3IcebergSink _),
    "s4_iceberg_source" -> (s4IcebergSource _),
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
    "s2_sessionize" -> """
      SELECT user_id, COUNT(*) AS n_events,
        MIN(event_id) AS first_event, MAX(event_id) AS last_event,
        CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM events
      GROUP BY user_id ORDER BY user_id""",
  )
}
