package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Context-window chunking ([[Corpus.chunk]]): stride/overlap boundaries,
  * short-doc passthrough, and full-coverage reassembly. */
class ChunkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunks advance by stride, overlap, and keep the tail") {
    val df = Seq((1L, doc(10))).toDF("id", "text")
    // 10 tokens, chunk 4, overlap 1 → stride 3: ceil(6/3)+1 = 3 chunks
    val got = Corpus.chunk(df, "text", "id", chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (0L, "w1 w2 w3 w4", 4L),
      (1L, "w4 w5 w6 w7", 4L),
      (2L, "w7 w8 w9 w10", 4L)))
  }

  test("short documents pass through as one whole chunk") {
    val df = Seq((1L, doc(3))).toDF("id", "text")
    val got = Corpus.chunk(df, "text", "id", chunkTokens = 64, overlap = 16)
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((0L, "w1 w2 w3", 3L)))
  }

  test("every token is covered; last chunk holds the remainder") {
    val df = Seq((1L, doc(70))).toDF("id", "text")
    // chunk 64, stride 48 → 2 chunks; second covers tokens 49..70
    val got = Corpus.chunk(df, "text", "id", chunkTokens = 64, overlap = 16)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 64L), (1L, 22L)))
    // union of chunk tokens = the document
    val tokens = Corpus.chunk(df, "text", "id", chunkTokens = 64, overlap = 16)
      .select("chunk_text").as[String].collect()
      .flatMap(_.split(" ")).toSet
    assert(tokens == (1 to 70).map(i => s"w$i").toSet)
  }

  test("guards: overlap must leave a positive stride") {
    val df = Seq((1L, doc(5))).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Corpus.chunk(df, "text", "id", chunkTokens = 8, overlap = 8)
    }
  }

  test("packSequences: concat-and-cut boundaries, bucket-count invariant") {
    // rows of 60 tokens each in id order: starts 0,60,120,180,240,300 →
    // with seqLen=128: seq ids 0,0,0,1,1,2
    val rows = (1L to 6L).map(i => (i, 0L, 60L)).toDF("id", "sub", "n")
    val got = Corpus.packSequences(rows, "id", "sub", "n", seqLen = 128,
        buckets = 4)
      .select("id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 60L), (3L, 0L, 120L),
      (4L, 1L, 52L), (5L, 1L, 112L), (6L, 2L, 44L)))
    // bucketing is an implementation knob: one bucket gives the same cut
    val one = Corpus.packSequences(rows, "id", "sub", "n", seqLen = 128,
        buckets = 1)
      .select("id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(one == got)
  }
}
