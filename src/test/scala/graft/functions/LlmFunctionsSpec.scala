package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity}

class LlmFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("WordShingles expression matches the built-in composition") {
    val df = Seq("a b c d e", "a b", "", "x x x x",
      "one two three four five six").toDF("text")
    // reference composition (what the DuckDB oracle mirrors); guarded for
    // <n tokens because Spark's sequence(1, 0) is DESCENDING, not empty
    val t = split(col("text"), " ")
    val idx = sequence(lit(1), greatest(size(t) - 2, lit(0)))
    val ref = when(size(t) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(transform(idx, i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
    val rows = df.select(
      graft.functions.TextFunctions.wordShingles(col("text"), 3).as("fast"),
      ref.as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch: $r")
    }
  }

  test("MinHash signature: identical texts agree, disjoint texts do not") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("id", "text")
    val sig = df.select(col("id"),
      MinHash.minhash(TextFunctions.wordShingles(col("text"), 3), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    assert(sig(1L).size == 64)
  }

  test("minhashDedup finds near-duplicates that ngramJaccardPairs finds") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (0L, base),
      (1L, base + " phi"), // near-dup of 0
      (2L, "one two three four five six seven eight nine ten eleven twelve"),
      (3L, "red orange yellow green blue indigo violet white black brown"))
      .toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDedup(docs, "text", "doc_id", 3, 64, 16, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((0L, 1L)))
    assert(lsh == exact)
  }

  test("simhash: near-dup pairs have small hamming distance") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq((0L, base), (1L, base + " phi"),
      (2L, "unrelated totally different content with other words here yes"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", 3, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("simhash bucket cap defuses a degenerate identical-doc corpus") {
    // 1k identical docs collide in ALL four 16-bit blocks — uncapped, the
    // band join enumerates ~2M candidate pairs (and at corpus scale goes
    // quadratic). The cap drops the degenerate buckets entirely; identical
    // docs are exactDedup's job.
    val docs = (0L until 1000L).map(i => (i,
      "same boilerplate text repeated for every document in this corpus " +
        "over and over again without any variation at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", 3,
      maxHamming = 16, maxBucketSize = 100)
    assert(pairs.count() == 0, "capped buckets must produce no candidates")
    // the cap must not disturb a healthy corpus: near-dup still found
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val healthy = Seq((0L, base), (1L, base + " phi"),
      (2L, "unrelated totally different content with other words here yes"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(healthy, "text", "doc_id", 3,
      maxHamming = 16, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)))
  }

  test("exactDedup marks canonical copies") {
    val docs = Seq((10L, "same text"), (11L, "same text"), (12L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(10L) == ((2L, 10L, true)))
    assert(out(11L) == ((2L, 10L, false)))
    assert(out(12L) == ((1L, 12L, true)))
  }

  test("cosine similarity: exact values on known vectors") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f))).toDF("id", "v")
    val a = df.as("a").filter($"a.id" === 1L)
    val b = df.as("b")
    val out = a.crossJoin(b)
      .select($"b.id", VectorFunctions.cosine($"a.v", $"b.v").as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
    assert(math.abs(out(3L) - math.sqrt(0.5)) < 1e-12)
  }

  test("brute-force topK returns k ranked neighbors per query") {
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" < 2),
      "embedding", "vec_id", 3)
    assert(out.count() == 6)
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) == 3))
  }

  test("lsh topK is a subset-ranking of candidates with correct schema") {
    val vecs = (0L until 50L).map(i =>
      (i, Array.tabulate(64)(d => math.sin(i * 64 + d).toFloat))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs, vecs.filter($"vec_id" < 3),
      "embedding", "vec_id", 5, planes = 4, dims = 64)
    assert(out.columns.toSeq == Seq("query_id", "rank", "neighbor_id", "cos"))
    assert(out.count() > 0)
  }

  test("multimodal: stub decode is deterministic and distributed") {
    val docs = Seq((0L, "hello world"), (1L, "spark rules"), (2L, "abc"))
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(media.columns.toSeq == Seq("doc_id", "media_type", "payload", "byte_len"))
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length == 8))
    assert(f1.map(_.media_type).toSeq == Seq("image", "audio", "video"))
  }

  test("multimodal: resize rescales by area ratio; frame sampling covers videos") {
    val docs = Seq((0L, "hello world"), (1L, "spark rules"), (2L, "abc"))
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val orig = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val resized = Multimodal.resize(media, 224, 224).collect().sortBy(_.doc_id)
    assert(resized.forall(f => f.width == 224 && f.height == 224))
    orig.zip(resized).foreach { case (o, r) =>
      val ratio = (224.0 * 224) / (o.width.toDouble * o.height)
      o.feature.zip(r.feature).foreach { case (a, b) =>
        assert(math.abs(a * ratio - b) < 1e-12)
      }
    }
    val frames = Multimodal.frameSample(media, step = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    // non-videos emit exactly frame 0; videos emit ceil(n_frames/4) frames
    assert(frames.filter(_._1 != 2L).forall(f => f._2 == 0 && f._3 == 1))
    val videoFrames = frames.filter(_._1 == 2L)
    val n = videoFrames.head._3
    assert(videoFrames.map(_._2).sorted.toSeq == (0 until n by 4).toSeq)
    intercept[IllegalArgumentException](Multimodal.frameSample(media, 0))
  }

  test("langId expression matches the composable formulation on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatch = docs.select(
        TextFunctions.langId(col("text")).as("fast"),
        TextFunctions.langIdComposed(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatch == 0)
  }

  test("langId picks marker language; CJK wins") {
    val df = Seq(
      (1L, "the cat and the dog in the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "no markers whatsoever xyz qqq"),
      (4L, "中文 text with cjk")).toDF("id", "text")
    val out = df.select($"id", TextFunctions.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
    assert(out(4L) == "zh")
  }
}
