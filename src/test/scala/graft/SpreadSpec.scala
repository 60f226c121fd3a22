package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r21 scan-parallelism floor ([[Queries.spread]] /
  * [[Queries.orderedSpread]]). The bench SFs ship each table as one small
  * unsplittable parquet file, so per-row kernels above a raw scan ran in a
  * single task; the helpers add one explicit-N exchange below the kernel.
  * These tests pin the two load-bearing contracts:
  *   1. results are IDENTICAL — spread changes layout only, and
  *      orderedSpread-based queries (which dropped their final `orderBy`)
  *      still come back in exact global key order;
  *   2. the mechanism actually fires at bench scale (explicit partition
  *      count = defaultParallelism, so AQE cannot coalesce it away). */
class SpreadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = s"${SparkEntry.testdataRoot}/sf0.001"

  test("spread keeps rows identical and lifts a tiny scan to cluster parallelism") {
    val raw = Queries.t(spark, sfDir, "documents")
    val sp = Queries.spread(raw, "doc_id")
    assert(sp.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
      "a tiny input must spread to defaultParallelism explicit partitions")
    val a = raw.orderBy("doc_id").collect().toSeq
    val b = sp.orderBy("doc_id").collect().toSeq
    assert(a == b, "spread must not change the rows")
  }

  test("orderedSpread queries return exact global key order without a final sort") {
    // EVERY contract query that dropped its trailing orderBy in favor of a
    // pre-kernel range sort (the full adopter list — r21 ADVICE flagged
    // that only four of the ten were pinned, leaving the others' oracle
    // hashes exposed to a silent plan change): output order is part of the
    // oracle hash, so global doc_id order must survive the kernel.
    Seq("tx_stats", "tx_classify", "tx_langid",
        "pipe_bpe_merge", "pipe_bpe_apply",
        "mm_decode", "mm_decode_png", "mm_decode_jpeg", "mm_decode_gif",
        "mm_decode_tiff").foreach { name =>
      val ids = SparkEntry.queries(name)(spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"$name lost global doc_id order")
      assert(ids.nonEmpty, s"$name returned no rows")
    }
  }

  test("orderedSpread equals the orderBy form row-for-row (order included)") {
    val base = Queries.t(spark, sfDir, "documents")
    val viaSpread = Queries.orderedSpread(base, "doc_id")
      .select(col("doc_id"), length(col("text")).as("n")).collect().toSeq
    val viaSort = base
      .select(col("doc_id"), length(col("text")).as("n"))
      .orderBy("doc_id").collect().toSeq
    assert(viaSpread == viaSort)
  }

  test("driftScale surfaces a uniform slowdown the gate normalizes away") {
    val base = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0)
    val uniform = Seq("a" -> 1.8, "b" -> 1.8, "c" -> 1.8, "d" -> 1.8)
    // the gate itself stays silent on uniform drift (by design) ...
    assert(Bench.detectRegressions(uniform, base).isEmpty)
    // ... but driftScale reports it, so main can warn loudly
    assert(math.abs(Bench.driftScale(uniform, base) - 1.8) < 1e-9)
    // a single-query spike barely moves the normalizer
    val spike = Seq("a" -> 5.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0)
    assert(Bench.driftScale(spike, base) == 1.0)
    // fewer than 3 comparable queries: no drift estimate
    assert(Bench.driftScale(Seq("a" -> 9.0), base) == 1.0)
  }
}
