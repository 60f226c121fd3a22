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

  test("packDocuments: boundary-aware greedy fill — whole docs, fresh " +
      "sequence when the remainder is too small, oversized docs get " +
      "their own sequence runs") {
    val rows = Seq((1L, 50L), (2L, 60L), (3L, 20L), (4L, 300L), (5L, 10L),
      (6L, 128L), (7L, 1L)).toDF("id", "n")
    val got = Corpus.packDocuments(rows, "id", "n", seqLen = 128, buckets = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 0L, 0L),   // fill 50
      (2L, 0L, 50L),  // 110 <= 128, packs behind doc 1
      (3L, 1L, 0L),   // 110+20 > 128: fresh sequence
      (4L, 2L, 0L),   // oversized: own run of ceil(300/128)=3 sequences
      (5L, 5L, 0L),   // next fresh sequence after the run
      (6L, 6L, 0L),   // exactly seqLen: can't share with doc 5
      (7L, 7L, 0L)),  // doc 6 filled its sequence completely
      s"unexpected packing: $got")
  }

  test("packDocuments: buckets pack independently and global sequence ids " +
      "chain through the per-bucket census") {
    // ids 0..9, 100 tokens each, 2 buckets (width 5): every doc owns a
    // sequence; bucket 1's local ids offset by bucket 0's count
    val rows = (0L until 10L).map(i => (i, 100L)).toDF("id", "n")
    val got = Corpus.packDocuments(rows, "id", "n", seqLen = 128, buckets = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == (0L until 10L).map(i => (i, i, 0L)),
      s"unexpected cross-bucket chaining: $got")
    // empty input: empty result, correct schema
    val empty = Corpus.packDocuments(rows.filter($"id" < 0), "id", "n", 128)
    assert(empty.columns.toSeq == Seq("id", "seq_id", "seq_offset"))
    assert(empty.count() == 0L)
  }

  test("packDocuments buckets by EXACT integer division over the MIN-" +
      "normalized id span: offsets past 2^53 land on the right side of a " +
      "bucket boundary") {
    // base B proves min-normalization (raw ids ~3·2^61 would all collapse
    // into one raw-range bucket and pack as a single run); the NORMALIZED
    // offsets {0, 2^59, 2^59+1, 2^60+1} with 2 buckets give width
    // W = 2^59+1, so offset 2^59 is the LAST id of bucket 0 and 2^59+1
    // the first of bucket 1. Double division (Column./) rounds
    // 2^59 / (2^59+1) to 1.0 and would pull the boundary id into
    // bucket 1 — both failure modes change the packing below.
    val base = 3L << 61
    val rows = Seq((base, 10L), (base + (1L << 59), 10L),
      (base + (1L << 59) + 1, 10L), (base + (1L << 60) + 1, 10L))
      .toDF("id", "n")
    val got = Corpus.packDocuments(rows, "id", "n", seqLen = 128, buckets = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (base, 0L, 0L),                      // bucket 0, first fill
      (base + (1L << 59), 0L, 10L),        // boundary id: still bucket 0
      (base + (1L << 59) + 1, 1L, 0L),     // bucket 1 starts fresh
      (base + (1L << 60) + 1, 1L, 10L)),   // packs behind it
      s"boundary id misbucketed: $got")
  }

  test("packers are TRANSLATION-INVARIANT in the id space: an offset " +
      "corpus (snowflake-style ids starting past 2^40) packs exactly like " +
      "the dense one") {
    // the raw-range bucketing this replaces collapsed an offset corpus
    // into ONE bucket: packSequences only lost balance (output invariant),
    // but packDocuments' bucket boundaries are semantic — the offset
    // corpus packed DIFFERENTLY than the same corpus with dense ids
    val off = 1L << 40
    val docs = (0L until 64L).map(i => (i, 10L + i % 37))
    val dense = docs.toDF("id", "n")
    val shifted = docs.map { case (i, n) => (i + off, n) }.toDF("id", "n")
    val d = Corpus.packDocuments(dense, "id", "n", seqLen = 128, buckets = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val s = Corpus.packDocuments(shifted, "id", "n", seqLen = 128, buckets = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
      .map { case (i, sq, o) => (i - off, sq, o) }.toSeq
    assert(d == s, s"offset ids packed differently:\n dense=$d\n shift=$s")
    val chunks = docs.map { case (i, n) => (i, 0L, n) }
    val ps = Corpus.packSequences(chunks.toDF("id", "sub", "n"),
        "id", "sub", "n", seqLen = 128, buckets = 8)
      .select("id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val pss = Corpus.packSequences(
        chunks.map { case (i, u, n) => (i + off, u, n) }.toDF("id", "sub", "n"),
        "id", "sub", "n", seqLen = 128, buckets = 8)
      .select("id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
      .map { case (i, sq, o) => (i - off, sq, o) }.toSeq
    assert(ps == pss, "packSequences must be id-translation-invariant")
  }

  test("min-normalized bucket assignment stays BALANCED on an offset id " +
      "space (the raw-range form put the whole corpus in one bucket — the " +
      "single-task straggler sort the auto-sizing exists to prevent)") {
    val off = 1L << 40
    val n = 1000
    val ids = (0L until n.toLong).map(_ + off).toDF("_id")
    val width = Corpus.idRangeWidth(off, off + n - 1, 8)
    val sizes = ids.select(Corpus.idBucket("_id", off, width).as("b"))
      .groupBy("b").count()
      .as[(Int, Long)].collect().toMap
    assert(sizes.keySet == (0 until 8).toSet,
      s"every bucket must be hit: ${sizes.keySet}")
    assert(sizes.values.max <= 2L * n / 8,
      s"offset ids must spread evenly: $sizes")
  }
}
