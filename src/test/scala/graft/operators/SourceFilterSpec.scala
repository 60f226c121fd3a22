package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source-level filtering ([[Corpus.sourceFilter]]): whole sources drop
  * when their flagged share reaches the threshold; the share test is
  * integer cross-multiplied (no float boundary). */
class SourceFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("sources at or above the flagged share drop wholesale") {
    // srcA: 1/4 flagged (keep at <2/4); srcB: 2/4 = exactly the threshold
    // (drop — the test is strict-less); srcC: 3/4 (drop)
    val docs = Seq(
      ("a1", "srcA", false), ("a2", "srcA", true), ("a3", "srcA", false), ("a4", "srcA", false),
      ("b1", "srcB", true), ("b2", "srcB", true), ("b3", "srcB", false), ("b4", "srcB", false),
      ("c1", "srcC", true), ("c2", "srcC", true), ("c3", "srcC", true), ("c4", "srcC", false))
      .toDF("id", "source", "bad")
    val kept = Corpus.sourceFilter(docs, "source", col("bad"), num = 2, den = 4)
      .select("id").as[String].collect().sorted.toSeq
    assert(kept == Seq("a1", "a2", "a3", "a4"),
      "every srcA doc survives (flagged ones included); srcB/srcC drop wholesale")
  }

  test("all-clean corpus passes through unchanged") {
    val docs = (1 to 10).map(i => (s"d$i", s"s${i % 3}", false)).toDF("id", "source", "bad")
    assert(Corpus.sourceFilter(docs, "source", col("bad"), 1, 100).count() == 10)
  }
}
