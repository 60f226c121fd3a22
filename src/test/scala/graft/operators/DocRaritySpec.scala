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

  test("codegen'd scoring expression is BIT-IDENTICAL to the composable " +
      "HOF formula it replaced (split on ' ' with empties kept, per-token " +
      "poly31 over non-newline code points, Fibonacci finalizer mod dim)") {
    import org.apache.spark.sql.functions._
    val w = Array.tabulate(64)(i => ((i * 37 + 11) % 21 - 10).toLong)
    val dim = w.length
    // the pre-round-20 interpreted-HOF construction, verbatim — the oracle
    // SQL replays exactly this, so equality here keeps the oracle valid
    def tokHash(t: org.apache.spark.sql.Column) = {
      val poly = aggregate(
        transform(regexp_extract_all(t, lit("[^\n]"), lit(0)),
          c => ascii(c).cast(org.apache.spark.sql.types.LongType)),
        lit(0L), (acc, x) => (acc * lit(31L) + x) % lit(1000000007L))
      ((poly * lit(2654435761L)) % lit(1000000007L)) % lit(dim.toLong)
    }
    val hofScore = lit(3L) + aggregate(
      transform(split(coalesce(col("text"), lit("")), " "),
        t => element_at(typedLit(w.toSeq), tokHash(t).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
    // adversarial corpus: empty tokens (leading/trailing/double spaces),
    // embedded newlines inside tokens (skipped chars, NOT boundaries),
    // null text, long tokens that wrap the poly modulus many times
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "  double  spaces  "), (5L, "new\nline in\ntoken"),
      (6L, "x" * 500 + " " + "longtokenwithmanychars" * 20),
      (7L, "punct!@# 123 mixed-CASE Tokens"))
      .toDF("doc_id", "text")
    val got = Corpus.hashedLinearScore(docs, "text", "doc_id", w, bias = 3L)
      .select("doc_id", "score").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val ref = docs.select(col("doc_id"), hofScore.as("score"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == ref, s"expression diverged from the HOF contract:\n $got\n $ref")
  }
}
