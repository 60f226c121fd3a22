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
  }
}
