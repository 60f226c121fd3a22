package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Token-rarity scoring ([[Corpus.docRarity]]): corpus-wide frequencies,
  * per-doc min/sum, null text, and the single-doc degenerate corpus. */
class DocRaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("min and sum of corpus token frequencies per document") {
    // corpus: "the" ×3, "cat" ×2, "sat" ×1, "dog" ×1
    val df = Seq(
      (1L, "the cat sat"),
      (2L, "the cat"),
      (3L, "the dog")).toDF("id", "text")
    val got = Corpus.docRarity(df, "text", "id").orderBy("id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 3L + 2L + 1L), // sat is rarest (1); sum 3+2+1
      (2L, 2L, 2L, 3L + 2L),
      (3L, 2L, 1L, 3L + 1L)))
  }

  test("repeated tokens inside one doc count every occurrence") {
    val df = Seq((1L, "a a b"), (2L, "b")).toDF("id", "text")
    val got = Corpus.docRarity(df, "text", "id").orderBy("id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // corpus freq: a=2 (both in doc 1), b=2
    assert(got == Seq((1L, 3L, 2L, 2L + 2L + 2L), (2L, 1L, 2L, 2L)))
  }

  test("null text becomes the single empty token, not a dropped doc") {
    val df = Seq((1L, "x y"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Corpus.docRarity(df, "text", "id").orderBy("id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got(1) == ((2L, 1L, 1L, 1L))) // "" occurs once corpus-wide
  }
}
