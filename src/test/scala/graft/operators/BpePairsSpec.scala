package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE pair counting ([[Corpus.bpePairCounts]]): multiplicity, ordering,
  * deterministic tie-break, the top-k cut, and degenerate docs. */
class BpePairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("adjacent pairs count with multiplicity across documents") {
    val df = Seq(
      (1L, "a b a b c"), // pairs: "a b", "b a", "a b", "b c"
      (2L, "a b")).toDF("id", "text")
    val got = Corpus.bpePairCounts(df, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("top-k cuts deterministically: count desc, then pair text asc") {
    val df = Seq((1L, "z y z y x w x w")).toDF("id", "text")
    // pairs: "z y"x1? — tokens: z y z y x w x w → pairs: z y, y z, z y? no:
    // (z,y)(y,z)(z,y)(y,x)(x,w)(w,x)(x,w) → z y:2, x w:2, y z:1, y x:1, w x:1
    val got = Corpus.bpePairCounts(df, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x w", 2L), ("z y", 2L), ("w x", 1L)))
  }

  test("single-token and null docs contribute nothing") {
    val df = Seq((1L, "solo"), (2L, null.asInstanceOf[String]),
      (3L, "p q")).toDF("id", "text")
    val got = Corpus.bpePairCounts(df, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("p q", 1L)))
  }
}
