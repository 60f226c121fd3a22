package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale behavior of the ANN/dedup operators: bucket counts must grow with
  * the corpus (candidate pairs ~linear, not quadratic), banded multi-table
  * LSH must keep recall, and the exact-dedup shuffle must be hash-keyed. */
class AnnScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def syntheticVectors(n: Int, dims: Int = 16, seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dims)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
  }

  test("autoPlanes scales bucket count with corpus size") {
    assert(Dedup.autoPlanes(1000, 64) == 4)   // floor at 4
    assert(Dedup.autoPlanes(64_000, 64) == 10)
    assert(Dedup.autoPlanes(6_400_000, 64) == 17)
    assert(Dedup.autoPlanes(Long.MaxValue / 2, 64) == 20) // ceiling at 20
  }

  test("candidate pairs grow ~linearly when the corpus doubles (auto planes)") {
    import graft.functions.VectorFunctions.lshBucket
    def candidates(n: Int): Long = {
      val df = syntheticVectors(n)
      val p = Dedup.autoPlanes(n, 16L) // small target so planes move at test sizes
      (0 until 4).map { tb =>
        df.select(lshBucket(col("embedding"), p, 16, seed = 42L + tb * 7919L).as("b"))
          .groupBy("b").count()
          .agg(sum(col("count") * (col("count") - 1) / 2).cast("long")).first().getLong(0)
      }.sum
    }
    val c1 = candidates(2000)
    val c2 = candidates(4000)
    // quadratic would be ~4x; linear is ~2x (planes grew by 1)
    assert(c2.toDouble / c1 < 3.0, s"candidate growth $c1 -> $c2 is superlinear")
  }

  test("banded multi-table near-dup recall follows LSH theory, no false positives") {
    import graft.functions.VectorFunctions.cosine
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exactDf = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", cosine(col("x.embedding"), col("y.embedding")))
      .filter(col("cos") >= 0.2)
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"), col("cos"))
    val exact = exactDf.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.embeddingNearDup(emb, "embedding", "vec_id",
        threshold = 0.2, planes = 2, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact), "false positives survived cosine verification")
    // predicted recall at the mean matched similarity: p = 1 - acos(s)/pi,
    // recall = 1 - (1 - p^2)^8; s in [0.2, ~0.5] -> predicted in [0.95, 0.999]
    val recall = if (exact.isEmpty) 1.0 else approx.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (found ${approx.size} of ${exact.size}; " +
      "theory predicts >= 0.95 for cos >= 0.2 with planes=2, tables=8)")
  }

  test("minhash bucket cap bounds candidates without losing fixture pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val unc = Dedup.minhashDedup(docs, "text", "doc_id").select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    // a generous cap changes nothing on this corpus
    val capped = Dedup.minhashDedup(docs, "text", "doc_id", maxBucketSize = 2000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == unc)
    // a tiny cap degrades candidates but must never produce false positives
    val tiny = Dedup.minhashDedup(docs, "text", "doc_id", maxBucketSize = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(tiny.subsetOf(unc))
  }

  test("duplicate-id inputs never produce self-pairs (the fused fan-out " +
      "keeps the old self-join's strict id_a < id_b)") {
    // two rows share doc_id=7: they land adjacent in the sorted member
    // array and would pair as (7,7) without the strict filter
    val docs = Seq(
      (7L, "alpha beta gamma delta epsilon"),
      (7L, "alpha beta gamma delta epsilon"),
      (9L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val mh = Dedup.minhashDedup(docs, "text", "doc_id",
      n = 3, k = 64, bands = 16, threshold = 0.1)
    assert(mh.filter(col("id_a") === col("id_b")).count() == 0,
      "minhash emitted a self-pair")
    // the verify join fans out over the duplicated shingle rows (one row
    // per duplicate, as the pre-fusion join did) — presence is the pin
    assert(mh.filter(col("id_a") === 7L && col("id_b") === 9L).count() >= 1,
      "the real cross-id pair must survive")
    val simh = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 32)
    assert(simh.filter(col("id_a") === col("id_b")).count() == 0,
      "simhash emitted a self-pair")
  }

  test("exactDedup matches text-grouped semantics via the hash-keyed shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.exactDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val want = docs.withColumn("n_copies",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("text"))))
      .withColumn("canonical_id",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("text"))))
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("n_copies"), col("canonical_id"), col("is_canonical"))
      .orderBy("doc_id").collect()
    assert(got.sameElements(want))
  }

  test("IVF top-k: high recall vs brute force while probing half the cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val index = Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 8)
    // index partitions the corpus completely
    assert(index.assigned.count() == emb.count())
    assert(index.centroids.count() == 8)
    val approx = Similarity.ivfTopK(index, queries, "embedding", "vec_id",
      k = 5, nProbe = 4)
    val counts = approx.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 5L))
    val got = approx.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall@5 = $recall probing 4/8 cells")
    // full probe = exact: nProbe == nlist degenerates to brute force
    val full = Similarity.ivfTopK(index, queries, "embedding", "vec_id",
      k = 5, nProbe = 8).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(full == exact, "full-probe IVF must equal brute force")
  }

  test("int8 quantization codes are exact round-half-up, zero-safe") {
    import graft.functions.VectorFunctions.quantizeInt8
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val got = df.select(col("id"), quantizeInt8(col("v")).as("q"))
      .orderBy("id").as[(Long, Array[Int])].collect()
    assert(got(0)._2.toSeq == Seq(127, -64, 32, 0)) // round(-63.5) half-up
    assert(got(1)._2.toSeq == Seq(0, 0, 0, 0))
  }

  test("IVF-SQ8 full probe + 4x re-rank equals brute force exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val index = Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 8)
    val sq = Similarity.ivfSqTopK(index, queries, "embedding", "vec_id",
        k = 5, nProbe = 8, rerankFactor = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(sq == exact, "full-probe SQ8 with re-rank must recover the exact top-k")
    // tight re-rank margin (factor 1) degrades but never exceeds k per query
    val tight = Similarity.ivfSqTopK(index, queries, "embedding", "vec_id",
      k = 5, nProbe = 8, rerankFactor = 1)
    val counts = tight.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 5L))
  }

  test("lshTopK with auto planes returns k ranked neighbors per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
      "embedding", "vec_id", k = 5)
    val counts = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 5 && counts.values.forall(_ == 5L),
      s"per-query neighbor counts: $counts")
  }

  test("corpus-sized query batches shuffle-join instead of forced broadcast, same top-k") {
    // queries == corpus: the join-everyone workload. Forcing the probe side
    // into every executor's memory is the 100TB OOM; past the byte ceiling
    // the hint must drop (shuffle join on the bucket/cell) with IDENTICAL
    // output, since the hint changes only the plan, never the semantics.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = Similarity.lshTopK(emb, emb, "embedding", "vec_id",
        k = 3, planes = 3, broadcastProbeBytes = 1L)
      assert(!shuffled.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "probe side must not be broadcast above the ceiling")
      val viaShuffle = shuffled.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val viaBroadcast = Similarity.lshTopK(emb, emb, "embedding", "vec_id",
          k = 3, planes = 3, broadcastProbeBytes = Long.MaxValue)
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(viaShuffle.sameElements(viaBroadcast))

      val index = Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 8)
      val ivfShuffled = Similarity.ivfTopK(index, emb, "embedding", "vec_id",
        k = 3, nProbe = 8, broadcastProbeBytes = 1L)
      val ivfS = ivfShuffled.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val ivfB = Similarity.ivfTopK(index, emb, "embedding", "vec_id",
          k = 3, nProbe = 8, broadcastProbeBytes = Long.MaxValue)
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(ivfS.sameElements(ivfB))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
