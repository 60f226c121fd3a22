package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Structured-Streaming operators over the events table.
  *
  * Each transform is written against a generic DataFrame so the SAME code
  * runs in batch mode (driver correctness checks) and as a streaming query
  * (`readStream` → transform → `writeStream`); the streaming spec drives it
  * through a file source + memory sink.
  *
  * events.parquet carries TIMESTAMP(NANOS). Spark has no nanos timestamp:
  * depending on the engine version/config the column surfaces as a ns-long
  * OR as TIMESTAMP_NTZ (µs, nanos floored); synthetic test frames pass ns
  * longs directly. [[tsMicros]] normalizes every shape to µs-since-epoch so
  * all event-time operators are schema-adaptive instead of pinned to one
  * engine behavior.
  */
object EventStreams {

  /** µs-since-epoch from the `ts` column, whatever type the engine read it
    * as. The NTZ branch interprets the wall-clock value as UTC — every
    * session in this repo (Verify/Bench/specs) pins
    * `spark.sql.session.timeZone=UTC`, matching DuckDB's `epoch_us` on the
    * same bytes. */
  def tsMicros(events: DataFrame): Column = events.schema("ts").dataType match {
    case LongType         => expr("ts div 1000") // ns → µs, floor
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case TimestampType    => unix_micros(col("ts"))
    case other => throw new IllegalArgumentException(
      s"events.ts: expected ns-long or timestamp, got $other")
  }

  /** Normalized event-time column (TimestampType, µs precision) for
    * watermarks/windows — identical output type for every input shape. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(tsMicros(events)))

  /** SESSION WINDOWS: per-user activity sessions closed by 30 minutes of
    * inactivity — Spark's `session_window` (dynamic windows that MERGE on
    * overlap: an event within the gap of the previous one extends the
    * session; at or past the gap it opens a new one). With a watermark
    * this is the canonical streaming sessionization (append mode emits a
    * session once the watermark passes its close); in batch the same
    * expression is a plain aggregation, so the oracle replays it as
    * gaps-and-islands SQL. State per key is one open session — bounded. */
  def sessionWindows(events: DataFrame, watermark: Boolean = false): DataFrame = {
    val base = withEventTime(events)
    val wm = if (watermark) base.withWatermark("event_time", "10 minutes") else base
    wm.groupBy(col("user_id"),
        session_window(col("event_time"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("session_value"))
  }

  /** Tumbling-window per-type aggregation; with a watermark this is an
    * append-able streaming aggregation, in batch it is a plain groupBy. */
  def windowedCounts(events: DataFrame, watermark: Boolean = false): DataFrame = {
    val base = withEventTime(events)
    val wm = if (watermark) base.withWatermark("event_time", "10 minutes") else base
    wm.groupBy(window(col("event_time"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
  }

  /** Stream-stream INNER interval join: each `click` matched to the same
    * user's `view`s at most `withinMinutes` earlier — the attribution shape
    * (view → later click) every event pipeline needs. Both sides carry
    * event-time watermarks so the join STATE IS BOUNDED: a buffered view
    * is evictable once the click-side watermark passes
    * `view_time + within`; without the time bound in the join condition
    * (or the watermarks) stream-stream join state grows without limit. In
    * batch mode the same transform is a plain interval join, so the oracle
    * replays it as SQL.
    *
    * Scale shape: the join shuffles both streams by user_id; state per key
    * is O(events inside the interval), trimmed every micro-batch by the
    * watermark — the standard bounded-state interval join. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
      withinMinutes: Int = 60, watermark: Boolean = false): DataFrame = {
    val v = withEventTime(views)
      .select(col("user_id"), col("event_id").as("view_id"),
        col("event_time").as("view_time"))
    val c = withEventTime(clicks)
      .select(col("user_id").as("_cuid"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
    val (vw, cw) =
      if (watermark)
        (v.withWatermark("view_time", "30 minutes"),
          c.withWatermark("click_time", "30 minutes"))
      else (v, c)
    vw.join(cw,
        col("user_id") === col("_cuid") &&
          col("click_time") >= col("view_time") &&
          col("click_time") < col("view_time") +
            expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  /** Streaming DEDUPLICATION on event id — the at-least-once → exactly-once
    * repair every ingestion pipeline needs (retried producers and replayed
    * kafka offsets deliver the same event twice). Streaming mode uses
    * `dropDuplicatesWithinWatermark`, so dedup STATE IS BOUNDED: a seen-key
    * entry is evictable once the watermark passes its event time plus the
    * delay — the contract is "duplicates arrive within the watermark
    * window", which is exactly the retry/replay window. Batch mode is plain
    * `dropDuplicates` (idempotent on identical duplicate rows, so
    * keep-"first" costs no determinism).
    *
    * Scale shape: one shuffle by key into the state store, O(keys inside
    * the watermark window) state per partition, appends flow through
    * without waiting for the watermark. */
  def dedupEvents(events: DataFrame, watermark: Boolean = false): DataFrame = {
    val base = withEventTime(events)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("event_time"))
    if (watermark)
      base.withWatermark("event_time", "30 minutes")
        .dropDuplicatesWithinWatermark("event_id")
    else base.dropDuplicates("event_id")
  }

  final case class EventIn(user_id: Long, event_id: Long, tsMicros: Long, value: Double)
  final case class SessionOut(user_id: Long, n_events: Long, first_event: Long,
      last_event: Long, total_cents: Long)
  // money accumulates in exact cents: a double sum would depend on the
  // (unspecified) iteration order of rows within the group
  final case class SessionState(n: Long, first: Long, last: Long, cents: Long)

  /** Per-user session rollup via mapGroupsWithState — the custom-state
    * primitive (runs in batch mode too, where state is per-group transient). */
  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_id"),
        tsMicros(events).as("tsMicros"), col("value"))
      .as[EventIn]
    typed.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventIn], state: GroupState[SessionState]) =>
          var s = state.getOption.getOrElse(SessionState(0L, Long.MaxValue, Long.MinValue, 0L))
          rows.foreach { e =>
            s = SessionState(s.n + 1, math.min(s.first, e.event_id),
              math.max(s.last, e.event_id), s.cents + math.round(e.value * 100))
          }
          state.update(s)
          SessionOut(user, s.n, s.first, s.last, s.cents)
      }
  }
}
