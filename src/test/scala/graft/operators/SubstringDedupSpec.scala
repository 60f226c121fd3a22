package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Repeated-span dedup ([[Corpus.substringSpans]]/[[Corpus.substringDedup]]):
  * corpus-first canonical choice, within-doc repeats, overlap/adjacency
  * merging, short-doc passthrough, full-doc removal, and null text. */
class SubstringDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def toksOf(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("a span copied across docs is flagged ONLY at the later occurrence") {
    // doc 1: unique prefix + 4-token duplicated block; doc 2: same block +
    // unique tail. w=4 so exactly the block windows collide.
    val block = "alpha beta gamma delta"
    val df = Seq(
      (1L, s"${toksOf(6, "u")} $block"),
      (2L, s"$block ${toksOf(6, "v")}")).toDF("id", "text")
    val spans = Corpus.substringSpans(df, "text", "id", w = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // canonical = (doc 1, pos 6); flagged = doc 2's [0, 4)
    assert(spans == Seq((2L, 0L, 4L, 1L)))
  }

  test("within-doc repetition flags the second copy; islands merge " +
      "overlapping and adjacent windows into one span") {
    // "a b c d a b c d": w=3 windows — (a b c)@0 == (a b c)@4,
    // (b c d)@1 == (b c d)@5; flagged positions 4 and 5 overlap → ONE span
    // [4, 8) with 2 windows
    val df = Seq((1L, "a b c d a b c d")).toDF("id", "text")
    val spans = Corpus.substringSpans(df, "text", "id", w = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 4L, 8L, 2L)))
  }

  test("disjoint duplicated regions stay separate spans") {
    val df = Seq(
      (1L, s"p q r ${toksOf(8, "x")} s t u"),
      (2L, s"p q r ${toksOf(8, "y")} s t u")).toDF("id", "text")
    val spans = Corpus.substringSpans(df, "text", "id", w = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // doc 2's "p q r" prefix [0,3) and "s t u" suffix [11,14) both flagged,
    // non-adjacent → two spans
    assert(spans == Seq((2L, 0L, 3L, 1L), (2L, 11L, 14L, 1L)))
  }

  test("substringDedup cuts flagged spans, keeps canonicals, and counts") {
    val block = "alpha beta gamma delta"
    val df = Seq(
      (1L, s"${toksOf(6, "u")} $block"),
      (2L, s"$block ${toksOf(6, "v")}"),
      (3L, "tiny doc")).toDF("id", "text")
    val got = Corpus.substringDedup(df, "text", "id", w = 4)
      .orderBy("id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, s"${toksOf(6, "u")} $block", 10L, 0L), // canonical: untouched
      (2L, toksOf(6, "v"), 10L, 4L),              // block cut, tail kept
      (3L, "tiny doc", 2L, 0L)))                  // shorter than w: verbatim
  }

  test("a fully-duplicated doc rewrites to empty text, not null") {
    val df = Seq(
      (1L, "one two three four"),
      (2L, "one two three four")).toDF("id", "text")
    val got = Corpus.substringDedup(df, "text", "id", w = 4)
      .orderBy("id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "one two three four", 4L, 0L),
      (2L, "", 4L, 4L)))
  }

  test("null text survives as the empty doc it is") {
    val df = Seq((1L, "some text here okay"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Corpus.substringDedup(df, "text", "id", w = 3)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    // split("", " ") yields [""] — one empty token, nothing flagged
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got(1)._4 == 0L)
  }

  test("w below 2 refuses loudly") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.substringSpans(df, "text", "id", w = 1)
    }
    assert(e.getMessage.contains("window width"))
  }
}
