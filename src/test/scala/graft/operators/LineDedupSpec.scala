package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Repeated-line removal ([[Corpus.lineDedup]]): cross-document frequency
  * threshold, order-preserving reassembly, within-doc repeats, empty-doc
  * survival, and custom separators. */
class LineDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("lines shared by >= minDocFreq docs vanish everywhere, order kept") {
    val df = Seq(
      (1L, "cookie banner\nreal content one\nfooter"),
      (2L, "cookie banner\nreal content two\nfooter"),
      (3L, "unique intro\nreal content three")).toDF("id", "text")
    val got = Corpus.lineDedup(df, "text", "id")
      .orderBy("id")
      .select("id", "clean_text", "n_lines", "n_lines_kept")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "real content one", 3L, 1L),
      (2L, "real content two", 3L, 1L),
      (3L, "unique intro\nreal content three", 2L, 2L)))
  }

  test("a line repeated only WITHIN one doc is content, not boilerplate") {
    val df = Seq(
      (1L, "chorus\nverse\nchorus"),
      (2L, "something else")).toDF("id", "text")
    val got = Corpus.lineDedup(df, "text", "id")
      .filter($"id" === 1L).select("clean_text", "n_lines_kept")
      .as[(String, Long)].head()
    assert(got == (("chorus\nverse\nchorus", 3L)))
  }

  test("a doc that is ALL boilerplate survives with empty text") {
    val df = Seq(
      (1L, "nav"), (2L, "nav"), (3L, "nav\nbody")).toDF("id", "text")
    val got = Corpus.lineDedup(df, "text", "id")
      .orderBy("id")
      .select("id", "clean_text", "n_lines_kept")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "", 0L), (2L, "", 0L), (3L, "body", 1L)))
  }

  test("separator is treated literally (regex metachars are safe)") {
    val df = Seq(
      (1L, "dup|one"), (2L, "dup|two")).toDF("id", "text")
    val got = Corpus.lineDedup(df, "text", "id", sep = "|")
      .orderBy("id").select("clean_text").as[String].collect().toSeq
    assert(got == Seq("one", "two"))
  }

  test("higher minDocFreq keeps lines under the threshold") {
    val df = Seq(
      (1L, "twice\na"), (2L, "twice\nb"),
      (3L, "thrice\nc"), (4L, "thrice\nd"), (5L, "thrice\ne")).toDF("id", "text")
    val got = Corpus.lineDedup(df, "text", "id", minDocFreq = 3)
      .orderBy("id").select("clean_text").as[String].collect().toSeq
    assert(got == Seq("twice\na", "twice\nb", "c", "d", "e"))
  }
}
