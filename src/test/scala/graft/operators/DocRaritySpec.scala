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

  test("hashedLinearScore: bucket-sum additivity, bias/threshold wiring, " +
      "same token same bucket, kept flag") {
    val w = Array.tabulate(16)(i => (i * 7 % 11 - 5).toLong)
    def score(text: String, bias: Long = 0L): Long =
      Corpus.hashedLinearScore(Seq((1L, text)).toDF("id", "text"),
          "text", "id", w, bias = bias)
        .select("score").as[Long].collect().head
    // score is a sum of per-token bucket weights: concatenation adds
    val (sa, sb, sab) = (score("alpha"), score("beta"), score("alpha beta"))
    assert(sab == sa + sb, s"additivity: $sa + $sb != $sab")
    // identical tokens hash identically (double weight)
    assert(score("alpha alpha") == 2 * sa)
    // bias shifts every score; threshold decides kept
    assert(score("alpha", bias = 100L) == sa + 100L)
    val flags = Corpus.hashedLinearScore(
        Seq((1L, "alpha"), (2L, "alpha")).toDF("id", "text"),
        "text", "id", w, threshold = sa)
      .select("kept").as[Boolean].collect().toSeq
    assert(flags == Seq(true, true), "score == threshold keeps")
    val flags2 = Corpus.hashedLinearScore(
        Seq((1L, "alpha")).toDF("id", "text"),
        "text", "id", w, threshold = sa + 1)
      .select("kept").as[Boolean].collect().toSeq
    assert(flags2 == Seq(false), "score < threshold drops")
    // degenerate: zero-dim weight table refuses
    intercept[IllegalArgumentException](
      Corpus.hashedLinearScore(Seq((1L, "x")).toDF("id", "text"),
        "text", "id", Array.empty[Long]))
  }
}
