package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-mode parity for the five event-time contract queries.
  *
  * Round-9 post-mortem: the engine changed how parquet TIMESTAMP(NANOS)
  * surfaces (ns-long → TIMESTAMP_NTZ) and five registered queries failed
  * analysis at Verify time without any spec catching it — the streaming
  * specs used synthetic long-ts frames, so they stayed green while the
  * fixture-driven path was broken. This spec runs each contract BODY on the
  * driver's own sf0.001 bytes and pins output schema + non-emptiness, so a
  * `ts`-typing drift can never again be silent.
  */
class EventTimeParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  /** name → expected (column, type) signature, exactly what the DuckDB
    * oracle hashes against. */
  val expected: Map[String, Seq[(String, DataType)]] = Map(
    "aj_asof" -> Seq("event_id" -> LongType, "user_id" -> LongType,
      "purchase_event_id" -> LongType, "purchase_value" -> DoubleType),
    "s1_window_agg" -> Seq("window_start" -> TimestampType,
      "event_type" -> StringType, "n" -> LongType,
      "total_value" -> DoubleType),
    "s2_sessionize" -> Seq("user_id" -> LongType, "n_events" -> LongType,
      "first_event" -> LongType, "last_event" -> LongType,
      "total_cents" -> LongType),
    "s7_stream_join" -> Seq("user_id" -> LongType, "view_id" -> LongType,
      "click_id" -> LongType),
    "s8_stream_dedup" -> Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType))

  expected.foreach { case (name, sig) =>
    test(s"$name contract body runs on the staged fixture: schema + rows") {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val got = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      assert(got == sig, s"$name schema drifted")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("tsMicros is schema-adaptive: ns-long, TIMESTAMP_NTZ and TIMESTAMP agree") {
    import spark.implicits._
    val micros = 1700000000123456L // µs-aligned instant
    val asLong = Seq(Tuple1(micros * 1000L)).toDF("ts") // ns long
    val asNtz = asLong.select((col("ts") / 1000L).cast(LongType).as("us"))
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val asTs = asLong.select(timestamp_micros(
      (col("ts") / 1000L).cast(LongType)).as("ts"))
    for (df <- Seq(asLong, asNtz, asTs)) {
      val v = df.select(EventStreams.tsMicros(df).as("us"))
        .head().getLong(0)
      assert(v == micros, s"tsMicros mismatch for ${df.schema("ts").dataType}")
    }
    // the fixture itself must be one of the handled shapes
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)
      .contains(ev.schema("ts").dataType))
  }
}
