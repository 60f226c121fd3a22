package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic global shuffle ([[Corpus.globalShuffle]]): a dense,
  * reproducible permutation in engine-portable md5 order, computed with
  * bucketed local sorts instead of a global sort. */
class GlobalShuffleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("ranks are a dense permutation equal to the global md5 sort") {
    val df = (0L until 1000L).map(i => (i, s"doc$i")).toDF("id", "body")
    val got = Corpus.globalShuffle(df, "id", salt = "s1", buckets = 16)
    // dense permutation 0..n-1
    val ranks = got.select("shuffle_rank").as[Long].collect().sorted
    assert(ranks.toSeq == (0L until 1000L))
    // all original columns survive
    assert(got.columns.toSet == Set("id", "body", "shuffle_rank"))
    // equals the single-sort definition it replaces
    val reference = df
      .withColumn("_h", md5(concat(col("id").cast("string"), lit("s1"))))
      .orderBy(col("_h"), col("id"))
      .withColumn("shuffle_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_h"), col("id"))) - 1)
      .select(col("id"), col("shuffle_rank"))
    val gotPairs = got.select("id", "shuffle_rank").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    val refPairs = reference.as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotPairs == refPairs)
  }

  test("deterministic across runs; a new salt gives a different permutation") {
    val df = (0L until 200L).map(i => (i, i * 2)).toDF("id", "v")
    val a = Corpus.globalShuffle(df, "id", salt = "e1", buckets = 8)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Corpus.globalShuffle(df, "id", salt = "e1", buckets = 8)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "same salt must replay the identical permutation")
    // bucket count is an implementation knob, not part of the permutation
    val c = Corpus.globalShuffle(df, "id", salt = "e1", buckets = 3)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == c, "bucketing must not change the permutation")
    val d = Corpus.globalShuffle(df, "id", salt = "e2", buckets = 8)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a != d, "a fresh salt must give a fresh permutation")
    // the auto-sized default (buckets = 0) is the same permutation too
    val auto = Corpus.globalShuffle(df, "id", salt = "e1")
      .select("id", "shuffle_rank").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == auto, "auto-sized buckets must not change the permutation")
  }

  test("bucket auto-sizing grows with input size: task-sized buckets at " +
      "every scale, parallelism floor, driver-state cap") {
    def b(bytes: BigInt, par: Int) = Corpus.autoBucketsFor(bytes, par)
    // floor: tiny inputs still occupy every core
    assert(b(BigInt(1), 32) == 32)
    // growth: ~256 MB per bucket once the input outgrows the floor
    assert(b(BigInt(256L << 20) * 1000, 32) == 1001)
    // 100 TB → ~400k buckets: the local sort stays ~256 MB per task and
    // the driver offset table stays metadata-scale (the fixed 1024 default
    // this replaces would have sorted ~100 GB per bucket)
    val at100TB = b(BigInt(100L * (1L << 40)), 1000)
    assert(at100TB > 300000 && at100TB < 500000, s"got $at100TB")
    // monotone in bytes
    val seq = Seq(1L, 1L << 30, 1L << 36, 1L << 40, 1L << 44, 1L << 50)
      .map(x => b(BigInt(x), 8))
    assert(seq == seq.sorted, s"not monotone: $seq")
    // cap: the offset table is COLLECTED, so even a genuine ~PB input
    // keeps driver state at ~1M rows (the cap binds past ~256 TB)
    assert(b(BigInt(1L << 50), 8) == (1 << 20))
    // sentinel guard: near-Long.MaxValue "sizes" are Spark's
    // defaultSizeInBytes for unestimatable plans, not measurements —
    // auto-sizing falls back to the parallelism floor instead of slamming
    // into the cap and handing the driver a cap-sized collect
    assert(b(BigInt(Long.MaxValue), 8) == 8)
    assert(b(BigInt(2).pow(80), 8) == 8)
  }
}
