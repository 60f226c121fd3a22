package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SimHash, TextFunctions => TF}
import graft.operators.{Corpus, Dedup, JpegCodec, Multimodal, Similarity}

/** LLM-training-data pipeline operators exposed through the driver contract:
  * dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding),
  * similarity search (brute-force + LSH ANN), text analysis, multimodal
  * plumbing. Oracles are supplied wherever the computation is expressible in
  * DuckDB SQL with bit-identical arithmetic; hash-based ops are rows-only.
  */
object LlmQueries {
  import Queries.{t, spread, orderedSpread}

  /** The corpus tables with the scale-adaptive scan-parallelism floor
    * ([[Queries.spread]]) applied: the bench SFs ship each table as ONE
    * small parquet file, so every per-row kernel above the raw scan
    * (shingling, MinHash, regexes, codecs) would otherwise run in a
    * single task. At scale the floor is a no-op. */
  private def docs(s: SparkSession, dir: String): DataFrame =
    spread(t(s, dir, "documents"), "doc_id")
  private def embs(s: SparkSession, dir: String): DataFrame =
    spread(t(s, dir, "embeddings"), "vec_id")

  // ------------------------------------------------------------------ dedup

  def ddExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(t(s, dir, "documents"), "text", "doc_id").orderBy("doc_id")

  def ddNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
      n = 3, threshold = 0.5).orderBy("id_a", "id_b")

  def ddMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashDedup(t(s, dir, "documents"), "text", "doc_id",
      n = 3, k = 64, bands = 16, threshold = 0.5).orderBy("id_a", "id_b")

  /** Near-dup PAIRS resolved into duplicate GROUPS (connected components,
    * min-id canonical) — the form a dedup pipeline actually consumes:
    * keep one row per group_id. */
  def ddGroups(s: SparkSession, dir: String): DataFrame =
    Dedup.dupGroups(
      Dedup.minhashDedup(t(s, dir, "documents"), "text", "doc_id",
        n = 3, k = 64, bands = 16, threshold = 0.5).select("id_a", "id_b"))
      .orderBy("id")

  /** Production SimHash (xxHash64 token hash) with a BOUNDED-ERROR oracle:
    * its pair set is compared against the engine-portable poly31 sibling
    * (itself exact-verified by DuckDB) and must agree within explicit
    * bounds — pair-set Jaccard overlap ≥ 0.5, recall ≥ 0.6, precision
    * ≥ 0.7 (measured 0.59-0.66 / 0.69-0.76 / 0.80-0.83 across sf0.001-0.1;
    * the two differ only in token hash, so the banding/Hamming machinery
    * is shared and the bound pins the hash-dependent drift). The oracle
    * recomputes the portable pair count independently in DuckDB; a bound
    * violation zeroes a flag and fails the hash match. */
  def ddSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    // ONE pass computes both signatures (the text scan + shingling
    // dominates); the banding/verify tails run off the persisted hashes
    val shingles = TF.wordShingles(col("text"), 3)
    val sh = d.select(col("doc_id").as("id"),
        SimHash.simhash64(shingles, SimHash.AlgoXx).as("hx"),
        SimHash.simhash64(shingles, SimHash.AlgoPoly31).as("hp"))
      .persist()
    try {
      val xx = Dedup.simhashPairsFromHashes(
        sh.select(col("id"), col("hx").as("h")), maxHamming = 16)
        .select("id_a", "id_b").persist()
      val po = Dedup.simhashPairsFromHashes(
        sh.select(col("id"), col("hp").as("h")), maxHamming = 16)
        .select("id_a", "id_b").persist()
      val nXx = xx.count()
      val nPo = po.count()
      val inter = xx.intersect(po).count()
      val union = nXx + nPo - inter
      xx.unpersist()
      po.unpersist()
      def ok(v: Boolean) = if (v) 1L else 0L
      Seq((nPo,
          ok(union == 0 || inter.toDouble / union >= 0.5),
          ok(nPo == 0 || inter.toDouble / nPo >= 0.6),
          ok(nXx == 0 || inter.toDouble / nXx >= 0.7)))
        .toDF("n_pairs_portable", "overlap_ok", "recall_ok", "precision_ok")
    } finally sh.unpersist()
  }

  /** Engine-portable SimHash: the same banding/verify pipeline as
    * [[ddSimhash]], with the poly31 token hash instead of xxHash64 so DuckDB
    * replays the ENTIRE computation (token hash → bit votes → 64-bit hash →
    * 16-bit-block candidate bands → Hamming verify) — giving the SimHash
    * family a full hash-match oracle alongside the xx-hash production
    * variant's rows check. */
  def ddSimhashRolling(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), "text", "doc_id",
      n = 3, maxHamming = 16, hashAlgo = SimHash.AlgoPoly31)
      .orderBy("id_a", "id_b")

  /** INCREMENTAL dedup gate: a deterministic split of the corpus
    * (doc_id % 5 == 0 plays the newly-ingested increment, the rest the
    * already-deduplicated history) exercises [[Corpus.incrementalDedup]]
    * end-to-end. The operator's 128-bit fingerprint anti-join means CONTENT
    * equality, so DuckDB replays it with text equality directly — the same
    * collision-freedom argument `dd_exact` rests on. */
  def ddIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Corpus.incrementalDedup(
      d.filter(col("doc_id") % 5 === 0),
      d.filter(col("doc_id") % 5 =!= 0), "text", "doc_id")
      .select("doc_id", "text", "lang", "source")
      .orderBy("doc_id")
  }

  /** Bloom-prefiltered incremental dedup: same exact result as
    * [[ddIncremental]]'s shape (different split so both run), with the
    * history membership test routed through a driver-held bloom filter —
    * certainly-novel docs skip the anti-join, only suspects probe it. The
    * REQUIREs pin the mechanism: the filter must route most of the novel
    * increment around the join, and every true duplicate must land in the
    * suspect set (no false negatives). */
  def ddBloomIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // increment = the new %7 slice PLUS a small RE-CRAWLED slice of history
    // docs (same text, same id — the duplicate shape an incremental crawl
    // produces); the bloom must route the re-crawls into the suspect set
    val hist = d.filter(col("doc_id") % 7 =!= 0)
    val recrawled = hist.filter(col("doc_id") % 97 === 3)
    val (out, nNovel, nSuspect) = Corpus.incrementalDedupBloom(
      d.filter(col("doc_id") % 7 === 0).unionAll(recrawled),
      hist, "text", "doc_id")
    require(nNovel > 0 && nSuspect > 0,
      s"bloom must split the increment (novel=$nNovel suspects=$nSuspect)")
    require(nNovel > nSuspect,
      s"most of this corpus's increment is novel — the bloom must route " +
        s"it around the join (novel=$nNovel suspects=$nSuspect)")
    out.select("doc_id", "text", "lang", "source").orderBy("doc_id")
  }

  def ddEmbedding(s: SparkSession, dir: String): DataFrame =
    // (planes=2, tables=24) tuned to the low 0.2 threshold: LSH-theory miss
    // probability (1-p^2)^24 ≈ 1e-4 per pair at cos=0.2, and the exact-cosine
    // verify step admits no false positives — measured recall on this corpus
    // is exactly 1.0 (0 of 6940 true pairs missed), so the exact all-pairs
    // cosine SQL is a true oracle, the same validation dd_minhash_lsh uses.
    Dedup.embeddingNearDup(embs(s, dir), "embedding", "vec_id",
      threshold = 0.2, planes = 2, dims = 64, tables = 24).orderBy("id_a", "id_b")

  // ------------------------------------------------------------- similarity

  def simTopkBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = embs(s, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
      "embedding", "vec_id", k = 5).orderBy("query_id", "rank")
  }

  /** Hyperplane-LSH ANN with a BOUNDED-ERROR oracle. On this isotropic
    * synthetic corpus top-k recall is governed by the probed-bucket
    * fraction (multi-probe covers 5 of 16 buckets at planes=4 →
    * measured mean recall 0.56-0.62 across sf0.001-0.1); the oracle bounds
    * mean recall@5 vs the exact brute-force sibling at ≥ 0.3 (half the
    * measured floor) and pins the deterministic integrity facts: every
    * query returns exactly k hits, ranked by true cosine, no self-matches
    * or duplicates. */
  def simTopkLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = embs(s, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val approx = Similarity.lshTopK(emb, queries,
      "embedding", "vec_id", k = 5, planes = 4, dims = 64)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 5)
    // Verdicts computed as distributed joins/aggs (same shape as
    // [[simTopkIvf]]) — nothing collects to the driver, so the audit scales
    // with n_queries like the operator itself.
    val matched = approx.join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("_matched"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rank"))
    val perQuery = approx
      .withColumn("_prev_cos", lag(col("cos"), 1).over(wq))
      .groupBy(col("query_id")).agg(
        count(lit(1)).as("_hits"),
        min(col("rank")).as("_rmin"),
        max(col("rank")).as("_rmax"),
        countDistinct(col("rank")).as("_rdis"),
        countDistinct(col("neighbor_id")).as("_ndis"),
        max((col("neighbor_id") === col("query_id")).cast("long")).as("_self"),
        max(coalesce((col("_prev_cos") < col("cos")).cast("long"), lit(0L)))
          .as("_unsorted"))
    val per = perQuery.join(matched, Seq("query_id"), "left")
      .select(col("_hits"),
        (col("_rmin") === 1 && col("_rmax") === col("_hits") &&
          col("_rdis") === col("_hits") && col("_unsorted") === 0L)
          .cast("long").as("_ranked"),
        (col("_ndis") === col("_hits") && col("_self") === 0L)
          .cast("long").as("_valid"),
        (coalesce(col("_matched"), lit(0L)).cast("double") / 5.0).as("_recall"))
    // coalesce keeps the documented 0/1 flag encoding when `approx` is
    // EMPTY (min/avg over zero rows are null): a totally-broken operator
    // must surface as explicit 0 flags, not nulls, in the oracle compare
    per.agg(
      count(lit(1)).as("n_queries"),
      coalesce(sum(col("_hits")), lit(0L)).as("n_hits"),
      coalesce(min(col("_ranked")), lit(0L)).as("ranked_ok"),
      coalesce(min(col("_valid")), lit(0L)).as("hits_valid"),
      coalesce((avg(col("_recall")) >= 0.3).cast("long"), lit(0L))
        .as("recall_ok"))
  }

  /** IVF (k-means inverted file) ANN probing 4 of 8 cells, with a
    * BOUNDED-ERROR oracle: per-query recall@5 vs the exact brute-force
    * sibling must be ≥ 0.2 (measured per-query minimum 0.4 across
    * sf0.001-0.1 — 2× margin; the full-probe sibling `sim_topk_ivf_full`
    * pins the index machinery exactly). */
  def simTopkIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val index = Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 8)
    val approx = Similarity.ivfTopK(index, queries,
      "embedding", "vec_id", k = 5, nProbe = 4)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 5)
    val matched = approx.join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_matched"))
    approx.groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      .join(matched, Seq("query_id"), "left")
      .select(col("query_id"), col("n_hits"),
        (coalesce(col("n_matched"), lit(0L)).cast("double") / 5.0 >= 0.2)
          .cast("long").as("recall_ok"))
      .orderBy("query_id")
  }

  /** FULL-probe IVF: probing every cell makes IVF exact (nProbe is the
    * recall/cost dial; nProbe=nlist is its endpoint), so DuckDB's
    * brute-force cosine top-k is a true oracle — a hash match verifies the
    * whole index path (k-means build, cell assignment, probe routing,
    * scoring, tie-breaking) independent of centroid randomness. */
  def simTopkIvfFull(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val index = Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 8)
    Similarity.ivfTopK(index, emb.filter(col("vec_id") < 10),
      "embedding", "vec_id", k = 5, nProbe = 8)
      .orderBy("query_id", "rank")
  }

  /** IVF-SQ8 + exact re-rank, probing every cell: with a full probe and a
    * 4× re-rank margin the int8 candidate ranking recovers the exact
    * top-5 (the quantized scan only PRESELECTS; the final cosine runs on
    * full-precision vectors), so DuckDB's brute-force top-k is a true
    * hash-exact oracle for the whole quantize→rank→refine path. */
  def simTopkSq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val index = Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 8)
    Similarity.ivfSqTopK(index, emb.filter(col("vec_id") < 10),
      "embedding", "vec_id", k = 5, nProbe = 8, rerankFactor = 4)
      .orderBy("query_id", "rank")
  }

  /** IVF-SQ8 at the PRUNED bench configuration — nlist=64, nProbe=8, the
    * shape a user actually runs at scale (and the one `sim_topk_sq_ann`
    * times) — with a bounded-error oracle mirroring [[simTopkIvf]]:
    * per-query recall@5 vs the exact brute-force sibling must be ≥ 0.2
    * (measured per-query minimum 0.4 at the sf0.01 gate — 2× margin; the
    * k-means build is seeded, so the measurement is reproducible). The
    * full-probe sibling `sim_topk_sq` pins the quantize→rank→refine
    * machinery hash-exactly; this value-gates the pruned probe so the
    * configuration the bench times is no longer timing-only. */
  def simTopkSqPruned(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val index = Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 64)
    val approx = Similarity.ivfSqTopK(index, queries,
      "embedding", "vec_id", k = 5, nProbe = 8, rerankFactor = 4)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 5)
    val matched = approx.join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_matched"))
    approx.groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      .join(matched, Seq("query_id"), "left")
      .select(col("query_id"), col("n_hits"),
        (coalesce(col("n_matched"), lit(0L)).cast("double") / 5.0 >= 0.2)
          .cast("long").as("recall_ok"))
      .orderBy("query_id")
  }

  // ---------------------------------------------------------- text analysis

  def txStats(s: SparkSession, dir: String): DataFrame = {
    // sort BELOW the regex-heavy feature projection (orderedSpread), so the
    // kernels run on every core, execute ONCE (a Sort directly above the
    // projection would range-sample its full lineage a second time), and
    // the output leaves the projection already in doc_id order
    val d = orderedSpread(t(s, dir, "documents"), "doc_id")
    val feats = TF.qualityFeatures(col("text"))
    d.select((col("doc_id") +: feats.map { case (n, c) => c.as(n) }) :+
      TF.tokenCountBpe(col("text")).as("n_tokens_bpe"): _*)
  }

  /** The WHOLE cleaning pipeline composed end-to-end, the way a training
    * corpus is actually prepared: quality gate → exact-dup canonicalization
    * → near-dup GROUP canonicalization (MinHash-LSH pairs + connected
    * components). Every stage is a DataFrame transform already verified on
    * its own; this query verifies the COMPOSITION against a DuckDB replay.
    * Output: the surviving clean corpus (one canonical doc per content
    * group), with quality scores. */
  /** Canonical (min-id) row per identical text — the skew-safe exact-dedup
    * step the composed pipelines share: 128-bit fingerprint aggregation +
    * join (partial aggregation folds a Zipf-head duplicated text map-side,
    * and the raw text never keys a shuffle). */
  private def exactCanon(df: DataFrame): DataFrame = {
    val keyed = df
      .withColumn("_f1", xxhash64(col("text")))
      .withColumn("_f2", xxhash64(lit(0x9747b28c), col("text")))
    val firsts = keyed.groupBy(col("_f1"), col("_f2"))
      .agg(min(col("doc_id")).as("_cid"))
    keyed.join(firsts, Seq("_f1", "_f2"))
      .filter(col("doc_id") === col("_cid"))
      .drop("_f1", "_f2", "_cid")
  }

  def pipeCleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    // 1. quality gate: keep docs passing >= 2 of 3 heuristics
    val quality = d.select(col("doc_id"), col("text"),
        TF.qualityScore(col("text")).as("quality"))
      .filter(col("quality") >= lit(2.0) / lit(3.0))
    // 2. exact dedup: canonical (min-id) copy per identical text —
    // fingerprint agg + join (the skew-safe canonicalization every dedup
    // operator uses; a window partitioned by the raw TEXT would ship full
    // documents through the shuffle and buffer the hot group in one task)
    val canon = exactCanon(quality)
    // 3. near-dup groups over the survivors: keep each group's min id
    val pairs = Dedup.minhashDedup(canon, "text", "doc_id",
      n = 3, k = 64, bands = 16, threshold = 0.5).select("id_a", "id_b")
    val groups = Dedup.dupGroups(pairs)
    canon.join(groups, canon("doc_id") === groups("id"), "left")
      .filter(col("group_id").isNull || col("group_id") === col("doc_id"))
      .select(col("doc_id"), col("quality"))
      .orderBy("doc_id")
  }

  def txQuality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TF.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  def txLangid(s: SparkSession, dir: String): DataFrame =
    orderedSpread(t(s, dir, "documents"), "doc_id")
      .select(col("doc_id"), TF.langId(col("text")).as("lang_pred"))

  /** Production xxHash64 token fingerprint with a BOUNDED-ERROR oracle:
    * the hash values are engine-specific, but their STRUCTURE is exactly
    * checkable — the fingerprint must be injective on the corpus's
    * canonical token sets (distinct-fingerprint count equals the
    * distinct-canonical-text count DuckDB computes independently; a
    * 64-bit collision on thousands of docs would break equality) and
    * consistent (every canonical text maps to one fingerprint). The
    * portable sibling `tx_fingerprint_rolling` hash-matches the values. */
  def txFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val canon = concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))
    val d = t(s, dir, "documents")
      .select(col("doc_id"), TF.tokenFingerprint(col("text")).as("fp"),
        canon.as("canon"))
    // consistency: one fingerprint per canonical text (fp is a pure
    // function of canon, so group-wise distinct counts must all be 1)
    val perCanon = d.groupBy("canon")
      .agg(countDistinct(col("fp")).as("nfp"))
      .agg(max(col("nfp")).as("max_fp_per_canon"))
    val totals = d.agg(count(lit(1)).as("n_docs"),
      countDistinct(col("canon")).as("n_distinct_canonical"),
      countDistinct(col("fp")).as("n_fp"))
    totals.crossJoin(perCanon)
      .select(col("n_docs"), col("n_distinct_canonical"),
        (col("n_fp") === col("n_distinct_canonical")).cast("long").as("fp_injective_ok"),
        (col("max_fp_per_canon") === 1L).cast("long").as("fp_consistent_ok"))
  }

  /** The engine-portable rolling fingerprint — same canonicalization as
    * [[txFingerprint]], but with a DuckDB-replayable hash. */
  def txFingerprintRolling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TF.rollingFingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  // ------------------------------------------------------ corpus preparation

  /** PII scrub: redact email/SSN/phone/IP-shaped spans to typed tokens and
    * report per-rule hit counts. Some rules fire on this synthetic corpus
    * (numbers/dots collide with the IP/phone shapes) — exactly what the
    * hash-compare needs to prove the rewrite itself. */
  def txRedact(s: SparkSession, dir: String): DataFrame = {
    val counts = TF.piiCounts(col("text")).map { case (n, c) => c.as(n) }
    t(s, dir, "documents")
      .select(col("doc_id") +: TF.redactPii(col("text")).as("clean") +: counts: _*)
      .orderBy("doc_id")
  }

  /** Gopher-style repetition metrics (dup-word fraction + top-2-gram
    * share) — the quality signal that catches templated/boilerplate spam
    * which per-token heuristics miss. */
  def txRepetition(s: SparkSession, dir: String): DataFrame =
    Corpus.repetitionStats(docs(s, dir), "text", "doc_id", n = 2)
      .orderBy("doc_id")

  /** Benchmark decontamination: docs sharing any word 5-gram with the
    * "benchmark" subset (doc_id % 17 == 0 stands in for an eval set) are
    * dropped — the eval-leakage guard every training corpus needs. */
  def pipeDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Corpus.decontaminate(d, d.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", n = 5)
      .select(col("doc_id")).orderBy("doc_id")
  }

  /** BOUNDARY-AWARE packing ([[Corpus.packDocuments]]): greedy fill of
    * 128-token sequences in doc-id order, whole documents only (oversized
    * docs get their own sequence runs), 8 id-range buckets chained by the
    * census. The oracle replays the sequential greedy recurrence with a
    * RECURSIVE CTE per bucket plus the same cumulative bucket offsets,
    * hash-checking every document's (seq_id, seq_offset). */
  def pipePackDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"),
      size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tokens"))
    Corpus.packDocuments(d, "doc_id", "n_tokens", seqLen = 128, buckets = 8)
      .orderBy("doc_id")
  }

  /** Synthetic hashed-classifier weights for the contract query: 64
    * buckets, integer weights in [-10, 10], deterministic — the oracle
    * embeds the identical literal list. */
  private val ClassifierWeights: Array[Long] =
    Array.tabulate(64)(i => ((i * 37 + 11) % 21 - 10).toLong)

  /** Hashed-linear quality classifier ([[Corpus.hashedLinearScore]]):
    * fasttext-slot model scoring as ONE expression-only projection. The oracle
    * replays the poly31 token hash, the bucket lookup, and the integer
    * sum in pure SQL, so scores AND keep decisions hash-match exactly. */
  def txClassify(s: SparkSession, dir: String): DataFrame =
    // hashedLinearScore is a pure order-preserving projection, so the sort
    // moves below it (orderedSpread) and the final orderBy goes away
    Corpus.hashedLinearScore(
        orderedSpread(t(s, dir, "documents"), "doc_id"), "text", "doc_id",
        ClassifierWeights, bias = 3L, threshold = 0L)

  /** FUZZY decontamination ([[Dedup.decontaminateFuzzy]]): drop corpus
    * docs NEAR-duplicate (shingle-Jaccard >= 0.5) to any benchmark doc —
    * candidates from a corpus x benchmark MinHash-LSH bucket join, exact
    * verification. Banding is threshold-derived (bands left at the
    * default: 32 x 2 for t = 0.5 via [[Dedup.bandsForThreshold]] — ≥ 99.9%
    * candidate recall AT the threshold, where the old fixed 16 x 4 sat at
    * 64% for a borderline pair). The oracle replays the exact all-pairs
    * Jaccard against the benchmark set in SQL, so it also PINS the LSH
    * recall: a qualifying pair the banding missed would hash-mismatch. */
  def pipeDecontaminateFuzzy(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.decontaminateFuzzy(d, d.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", n = 3, threshold = 0.5)
      .select(col("doc_id")).orderBy("doc_id")
  }

  /** Deterministic stratified mixture sampling by language: downsample
    * over-represented strata with a portable hash-uniform, reproducible
    * by the oracle (and by any reader of the recipe). */
  def pipeSampleMix(s: SparkSession, dir: String): DataFrame =
    Corpus.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "fr" -> 0.75, "es" -> 0.75), defaultRate = 1.0)
      .select(col("doc_id"), col("lang")).orderBy("doc_id")

  /** Source-level filtering: drop every document from sources where 40 %
    * or more of the docs are short (< 40 tokens) — the wholesale
    * domain-level cut per-document filters miss. The share test is integer
    * cross-multiplied, so the oracle replays it bit-exactly. */
  def pipeSourceFilter(s: SparkSession, dir: String): DataFrame =
    Corpus.sourceFilter(t(s, dir, "documents"), "source",
        TF.tokenCount(col("text")) < 40, num = 4, den = 10)
      .select(col("doc_id"), col("source")).orderBy("doc_id")

  /** Embedding-space balanced sampling ([[Corpus.clusterBalance]]): 16
    * sign-pattern clusters (bits=4), at most 16 kept per cluster by the
    * engine-portable poly31 u-rank. The oracle replays the bucketing and
    * the full top-N per cluster, pinning that the two-pass bin selection
    * equals an exact per-cluster ranking. */
  def pipeClusterMix(s: SparkSession, dir: String): DataFrame =
    Corpus.clusterBalance(t(s, dir, "embeddings"), "embedding", "vec_id",
      perBucket = 16, bits = 4, bins = 16).orderBy("vec_id")

  /** Token-rarity quality scores ([[Corpus.docRarity]]): min and sum of
    * corpus token frequencies per document, exact-integer so DuckDB
    * replays the scores bit-for-bit. */
  def txDocRarity(s: SparkSession, dir: String): DataFrame =
    Corpus.docRarity(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("doc_id")

  /** BPE pair-count kernel ([[Corpus.bpePairCounts]]): top-100 adjacent
    * token pairs corpus-wide, count-then-text ordered so the oracle
    * replays the exact top-k cut. */
  def pipeBpePairs(s: SparkSession, dir: String): DataFrame =
    Corpus.bpePairCounts(docs(s, dir), "text", k = 100)

  /** ONE full BPE merge round ([[Corpus.bpePairCounts]] →
    * [[Corpus.bpeMergeApply]]): the corpus-wide winning adjacent pair
    * (count-desc, pair-asc tie-break; empty split-noise tokens skipped)
    * collapses greedily, leftmost-non-overlapping, in every document. The
    * oracle re-derives the same winner in SQL and replays the greedy scan
    * with a run-parity window (consecutive matches — possible only when
    * the pair is (x, x) — merge at even run offsets only), hash-checking
    * every merged text and count. */
  def pipeBpeMerge(s: SparkSession, dir: String): DataFrame = {
    // ordered spread BELOW the merge map: the map preserves row order, so
    // the final orderBy goes away — with it the post-map range exchange
    // and the boundary-sampling pass that would run the merge twice
    val docs = orderedSpread(t(s, dir, "documents"), "doc_id")
    // malformed (empty-token) pairs are filtered BEFORE the top-k cut, so
    // the ranking universe matches the oracle's exactly — a corpus where
    // split noise floods the head can no longer starve the winner
    val winner = Corpus.bpePairCounts(docs, "text", k = 1, wellFormedOnly = true)
      .collect().headOption
      .map(_.getString(0).split(" ", -1))
      .getOrElse(throw new IllegalStateException(
        "corpus has no well-formed adjacent pair — nothing to merge"))
    Corpus.bpeMergeApply(docs, "text", "doc_id", winner(0), winner(1))
  }

  /** Full BPE trainer ([[Corpus.bpeTrain]]): THREE complete rounds of
    * count → pick → merge, each re-counting over the previous round's
    * merged corpus. The oracle replays all three rounds in SQL — winner
    * selection (well-formed universe, count-desc/pair-asc) and the greedy
    * run-parity merge — hash-checking every learned pair, its pick-time
    * count, and the number of merges applied. */
  def pipeBpeTrain(s: SparkSession, dir: String): DataFrame =
    Corpus.bpeTrain(docs(s, dir), "text", "doc_id", rounds = 3)
      .orderBy("round")

  /** BATCHED BPE trainer ([[Corpus.bpeTrainBatched]]): two rounds, each
    * picking the top-3 pairwise-NON-INTERACTING winners from the top-24
    * ranked well-formed pairs and applying them in ONE projection pass —
    * 6 merges for 4 corpus jobs where the sequential trainer pays 12. The
    * oracle replays the whole contract in SQL: the ranked candidate
    * window, the sequential compatibility filter (a recursive CTE carrying
    * the used-token set), the simultaneous greedy apply (run-parity), and
    * the per-pair applied-merge counts — every accepted pair, its rank,
    * pick-time count, and merge count hash-check exactly. */
  def pipeBpeTrainBatched(s: SparkSession, dir: String): DataFrame =
    Corpus.bpeTrainBatched(docs(s, dir), "text", "doc_id",
        rounds = 2, batch = 3, window = 24)
      .orderBy("round", "rank")

  /** Tokenizer INFERENCE ([[Corpus.bpeApplyMerges]]): train 3 merges, then
    * ENCODE the corpus with them in one zero-shuffle projection — a
    * trainer-faithful rank-order sweep (each merge one greedy pass, absent
    * merges skipped O(1)), so the encode equals the trainer's own output
    * unconditionally, aliasing corpora included. The oracle re-derives the
    * same 3 winners in SQL and replays the merges round by round,
    * hash-checking every document's tokenized text and token count. */
  def pipeBpeApply(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val merges = Corpus.bpeTrain(d, "text", "doc_id", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // encode over the ordered spread: the map preserves row order, so the
    // output needs no post-map sort (and no sampling re-run of the encode)
    Corpus.bpeApplyMerges(orderedSpread(t(s, dir, "documents"), "doc_id"),
      "text", "doc_id", merges)
  }

  /** Cross-document repeated-SPAN detection ([[Corpus.substringSpans]]):
    * 10-token windows (w=50 in production; 10 suits the short synthetic
    * docs) whose text repeats anywhere in the corpus, non-canonical
    * occurrences merged into maximal removable `[start, end)` token
    * ranges. The oracle replays window generation, corpus-first canonical
    * choice, and the gaps-and-islands merge — hash-checking every span
    * boundary. */
  def pipeSubstringSpans(s: SparkSession, dir: String): DataFrame =
    Corpus.substringSpans(t(s, dir, "documents"), "text", "doc_id", w = 10)
      .orderBy("doc_id", "span_start")

  /** The rewrite pass over the same spans ([[Corpus.substringDedup]]):
    * each document with its removable spans cut out, canonical copies
    * kept. The oracle rebuilds `clean_text` token-by-token, so the cut
    * positions and the reassembled text are hash-checked exactly. */
  def pipeSubstringClean(s: SparkSession, dir: String): DataFrame =
    Corpus.substringDedup(t(s, dir, "documents"), "text", "doc_id", w = 10)
      .orderBy("doc_id")

  /** Corpus-wide repeated-line removal: the documents table has no
    * newlines, so the query first RE-LINES each text deterministically
    * (3-token lines) and then strips every line whose distinct-document
    * frequency is ≥ 2 — the C4-style boilerplate cut. The oracle replays
    * both the re-lining and the removal, so the surviving text (order
    * preserved), line counts, and empty-doc handling are all hash-checked. */
  def pipeLineDedup(s: SparkSession, dir: String): DataFrame = {
    val toks = TF.tokens(col("text"))
    val nLines = greatest(((size(toks) + 2) / 3).cast("int"), lit(1))
    val lined = docs(s, dir).select(col("doc_id"),
      concat_ws("\n", transform(sequence(lit(0), nLines - 1),
        i => concat_ws(" ", slice(toks, i * 3 + 1, lit(3))))).as("text"))
    Corpus.lineDedup(lined, "text", "doc_id", "\n", minDocFreq = 2)
      .orderBy("doc_id")
  }

  /** Context-window chunking: 64-token chunks advancing by 48 (16-token
    * overlap), the split-long-documents step before tokenization. Fully
    * deterministic slicing, so DuckDB replays the exact chunks. */
  def pipeChunk(s: SparkSession, dir: String): DataFrame =
    Corpus.chunk(t(s, dir, "documents"), "text", "doc_id",
        chunkTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx")

  /** Sequence PACKING over the chunk stream: concat-and-cut into 256-token
    * training sequences in (doc_id, chunk_idx) order — each chunk learns
    * which sequence it starts in and at what offset. Chained directly on
    * [[pipeChunk]]'s output; the oracle replays the cut points with a
    * plain windowed SUM (integer-exact). */
  def pipePack(s: SparkSession, dir: String): DataFrame =
    Corpus.packSequences(
        Corpus.chunk(t(s, dir, "documents"), "text", "doc_id",
          chunkTokens = 64, overlap = 16),
        "doc_id", "chunk_idx", "n_tokens", seqLen = 256, buckets = 64)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("seq_id"), col("seq_offset"))
      .orderBy("doc_id", "chunk_idx")

  /** The MODERN TRAINING-DATA PIPELINE composed end-to-end: source-level
    * filter → benchmark decontamination → exact-dup canonicalization →
    * context-window chunking → sequence packing. Every stage is an
    * operator already verified on its own; this query verifies the
    * COMPOSITION — the DuckDB oracle replays all five stages and the
    * final integer cut points must match exactly. */
  def pipeE2e(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val srcKept = Corpus.sourceFilter(docs, "source",
      TF.tokenCount(col("text")) < 40, num = 4, den = 10)
    val decon = Corpus.decontaminate(srcKept,
      docs.filter(col("doc_id") % 17 === 0), "text", "doc_id", n = 5)
    val canon = exactCanon(decon)
    val chunks = Corpus.chunk(canon, "text", "doc_id",
      chunkTokens = 64, overlap = 16)
    Corpus.packSequences(chunks, "doc_id", "chunk_idx", "n_tokens",
        seqLen = 256, buckets = 64)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("seq_id"), col("seq_offset"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Deterministic global shuffle: the reproducible corpus permutation a
    * training run reads. Every row gets a dense rank in md5(key || salt)
    * order WITHOUT a global sort (fixed-width hash buckets + per-bucket
    * offsets — one shuffle); the oracle replays the exact permutation with
    * DuckDB's md5 over the same key. */
  def pipeShuffle(s: SparkSession, dir: String): DataFrame =
    Corpus.globalShuffle(t(s, dir, "documents"), "doc_id", salt = "ep1",
        buckets = 64)
      .select(col("doc_id"), col("shuffle_rank"))
      .orderBy("shuffle_rank")

  // -------------------------------------------------------------- multimodal

  def mmMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("media_type"), col("byte_len"))
      .orderBy("doc_id")

  /** Frame sampling over the media table: every 4th frame per video (rows
    * check — frame counts derive from the stub decode). */
  def mmFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(
      Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id", "text"), step = 4)
      .orderBy("doc_id", "frame_idx")

  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.featureSummary(
      Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id", "text"))

  /** END-TO-END media decode over REAL bytes (no stub anywhere): each
    * document synthesizes a BMP image and a PCM WAV clip whose dimensions,
    * pixels, and samples are pure integer functions of doc_id; the
    * byte-level codecs ([[Multimodal.MediaCodec]]) encode then decode them,
    * and the oracle recomputes every decoded fact — width, height, pixel
    * checksum, sample rate/count/sum — in plain SQL arithmetic. A decoder
    * that mis-reads any header field, row padding, bottom-up pixel order,
    * or sample byte breaks the hash match. */
  def mmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orderedSpread(t(s, dir, "documents").select(col("doc_id")), "doc_id")
      .as[Long].map { d =>
      val w = (4 + d % 5).toInt; val h = (3 + d % 7).toInt
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          rgb(p) = ((x * 7 + y * 13 + d) % 256).toByte
          rgb(p + 1) = ((x * 3 + y * 5 + d * 11) % 256).toByte
          rgb(p + 2) = ((x + y + d) % 256).toByte
          x += 1
        }
        y += 1
      }
      val (dw, dh, dpx) = Multimodal.MediaCodec.decodeBmp(
        Multimodal.MediaCodec.encodeBmp(w, h, rgb))
      var pixSum = 0L
      var i = 0
      while (i < dpx.length) {
        pixSum += (dpx(i) & 0xff) + 2L * (dpx(i + 1) & 0xff) +
          3L * (dpx(i + 2) & 0xff)
        i += 3
      }
      val n = (20 + d % 13).toInt
      val rate = (8000 + (d % 4) * 4000).toInt
      val samples = Array.tabulate(n)(k =>
        ((k * 31 + d * 17) % 65536 - 32768).toShort)
      val (drate, _, dsamp) = Multimodal.MediaCodec.decodeWav(
        Multimodal.MediaCodec.encodeWav(rate, 1, samples))
      // every other carrier depth round-trips through its own encode →
      // decode → 16-bit normalization: 24/32-bit integer and 32/64-bit
      // float are EXACT (checksums equal the 16-bit sum — pinned in SQL),
      // 8-bit floors to the 256 lattice (its own SQL replay)
      def rt(bits: Int, f32: Boolean = false): Long =
        Multimodal.MediaCodec.decodeWav(Multimodal.MediaCodec.encodeWav(
          rate, 1, samples, bits, f32))._3.map(_.toLong).sum
      (d, dw.toLong, dh.toLong, pixSum, drate.toLong, dsamp.length.toLong,
        dsamp.map(_.toLong).sum,
        rt(8), rt(24), rt(32), rt(32, f32 = true), rt(64))
    }.toDF("doc_id", "img_w", "img_h", "pix_sum", "wav_rate", "wav_n",
      "sample_sum", "sum_pcm8", "sum_pcm24", "sum_pcm32", "sum_f32", "sum_f64")
  }

  /** PNG decode round-trip over REAL bytes (Inflater + scanline unfilter,
    * zero codec libraries): per document, six variants — 8-bit grayscale
    * (color type 0), 24-bit RGB (type 2), 32-bit RGBA (type 6, alpha
    * dropped), 16-BIT gray (high byte back), 4-BIT gray (MSB-first unpack
    * + ×17 rescale), and 2-BIT palette (packed indices dereferencing a
    * 4-entry PLTE) — encode with CYCLING scanline filters (y % 5 walks
    * None/Sub/Up/Average/Paeth) then byte-decode; the oracle recomputes
    * every checksum in plain SQL integer arithmetic. A decoder mis-reading
    * any filter, the zlib framing, the bit unpacking, or the channel
    * expansion breaks the hash match. */
  def mmDecodePng(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orderedSpread(t(s, dir, "documents").select(col("doc_id")), "doc_id")
      .as[Long].map { d =>
      val w = (5 + d % 6).toInt; val h = (4 + d % 5).toInt
      def sumRgb(rgb: Array[Byte]): Long = {
        var s0 = 0L; var i = 0
        while (i < rgb.length) {
          s0 += (rgb(i) & 0xff) + 2L * (rgb(i + 1) & 0xff) +
            3L * (rgb(i + 2) & 0xff)
          i += 3
        }
        s0
      }
      val rgb = new Array[Byte](w * h * 3)
      val gray = new Array[Byte](w * h)
      val rgba = new Array[Byte](w * h * 4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = y * w + x
          val r0 = ((x * 7 + y * 13 + d) % 256).toByte
          val g0 = ((x * 3 + y * 5 + d * 11) % 256).toByte
          val b0 = ((x + y + d) % 256).toByte
          rgb(p * 3) = r0; rgb(p * 3 + 1) = g0; rgb(p * 3 + 2) = b0
          gray(p) = ((x * 11 + y * 3 + d * 7) % 256).toByte
          rgba(p * 4) = r0; rgba(p * 4 + 1) = g0; rgba(p * 4 + 2) = b0
          rgba(p * 4 + 3) = ((x + 2 * y + d) % 256).toByte
          x += 1
        }
        y += 1
      }
      // depth coverage beyond 8-bit: 16-bit gray (v×257 on the wire, high
      // byte back — identity), 4-bit gray on the ×17 lattice (quantize →
      // rescale is exact there), 2-bit PALETTE (indices pack verbatim and
      // dereference a 4-entry PLTE) — each checksummed independently so a
      // bit-unpacking or scaling bug breaks its own column
      val gray4 = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        (((x * 11 + y * 3 + d * 7) % 16) * 17).toByte
      }
      val palIdx = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        ((x + y + d) % 4).toByte
      }
      val pal = Array.tabulate(12) { i =>
        val j = i / 3
        (j * (i % 3 match { case 0 => 11; case 1 => 23; case _ => 37 })).toByte
      }
      val mc = Multimodal.MediaCodec
      val (dw, dh, dRgb) = mc.decodePng(mc.encodePng(w, h, 2, rgb))
      val (_, _, dGray) = mc.decodePng(mc.encodePng(w, h, 0, gray))
      val (_, _, dRgba) = mc.decodePng(mc.encodePng(w, h, 6, rgba))
      val (_, _, dG16) = mc.decodePng(mc.encodePng(w, h, 0, gray, bitDepth = 16))
      val (_, _, dG4) = mc.decodePng(mc.encodePng(w, h, 0, gray4, bitDepth = 4))
      val (_, _, dP2) = mc.decodePng(mc.encodePng(w, h, 3, palIdx, pal, bitDepth = 2))
      (d, dw.toLong, dh.toLong, sumRgb(dRgb), sumRgb(dGray), sumRgb(dRgba),
        sumRgb(dG16), sumRgb(dG4), sumRgb(dP2))
    }.toDF("doc_id", "png_w", "png_h", "rgb_sum", "gray_sum", "rgba_sum",
      "gray16_sum", "gray4_sum", "pal2_sum")
  }

  /** JPEG round-trips over REAL bytes ([[JpegCodec]]: pure-JVM huffman +
    * arithmetic + DCT + YCbCr, Annex K/D/F). JPEG is LOSSY, so this is a
    * BOUNDED-ERROR oracle (the established pattern): dimensions replay
    * exactly in SQL, and per-document reconstruction error on a smooth
    * gradient must stay inside the quantization budget (max ≤ 20/255,
    * mean ≤ 5) — flags zero on violation and the hash match breaks. The
    * progressive and ARITHMETIC (SOF9) decodes carry the same quantized
    * coefficients as the sequential stream, so their flags are EXACT
    * pixel-equality, not bounded. */
  def mmDecodeJpeg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orderedSpread(t(s, dir, "documents").select(col("doc_id")), "doc_id")
      .as[Long].map { d =>
      val w = (8 + d % 9).toInt; val h = (8 + d % 7).toInt
      val img = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          img(p) = (20 + x * 180 / w + (d % 40)).toByte
          img(p + 1) = (20 + y * 180 / h + (d % 25)).toByte
          img(p + 2) = (30 + (x + y) * 140 / (w + h) + (d % 50)).toByte
          x += 1
        }
        y += 1
      }
      val (dw, dh, out) = JpegCodec.decode(JpegCodec.encode(w, h, img, 90))
      var maxE = 0; var sum = 0L
      var i = 0
      while (i < img.length) {
        val e = math.abs((img(i) & 0xff) - (out(i) & 0xff))
        if (e > maxE) maxE = e
        sum += e
        i += 1
      }
      val meanOk = sum.toDouble / img.length <= 5.0
      // PROGRESSIVE (SOF2) path: the spectral-selection scan script carries
      // the SAME quantized coefficients, so its decode must render
      // PIXEL-IDENTICAL to the sequential decode — an exact flag, not a
      // bounded one (multi-scan reassembly has no extra loss to budget for)
      val (pw2, ph2, prog) = JpegCodec.decode(
        JpegCodec.encode(w, h, img, 90, progressive = true))
      val progOk = pw2 == dw && ph2 == dh && java.util.Arrays.equals(prog, out)
      // 12-BIT precision (SOF1 + counted optimal tables): same quant
      // tables on 16x-amplified samples, so the error budget TIGHTENS
      // (max <= 6 where 8-bit allows 20)
      val (_, _, p12) = JpegCodec.decode(
        JpegCodec.encode(w, h, img, 90, precision = 12))
      var max12 = 0
      i = 0
      while (i < img.length) {
        val e = math.abs((img(i) & 0xff) - (p12(i) & 0xff))
        if (e > max12) max12 = e
        i += 1
      }
      // ARITHMETIC coding (SOF9, T.81 Annex D/F): a transparent entropy
      // layer over the SAME quantized coefficients, so its decode must be
      // PIXEL-IDENTICAL to the sequential huffman decode — an exact flag
      val (aw, ah, arith) = JpegCodec.decode(
        JpegCodec.encode(w, h, img, 90, arithmetic = true))
      val arithOk = aw == dw && ah == dh && java.util.Arrays.equals(arith, out)
      (d, dw.toLong, dh.toLong,
        if (maxE <= 20) 1L else 0L, if (meanOk) 1L else 0L,
        if (progOk) 1L else 0L, if (max12 <= 6) 1L else 0L,
        if (arithOk) 1L else 0L)
    }.toDF("doc_id", "jpg_w", "jpg_h", "err_max_ok", "err_mean_ok",
      "prog_identical", "p12_err_ok", "arith_identical")
  }

  /** GIF decode round-trip over REAL bytes (LZW + palette, zero codec
    * libraries): per document, an 8-color palette and an index raster are
    * pure integer functions of doc_id; [[Multimodal.MediaCodec]] encodes
    * them as a GIF89a — once sequential, once INTERLACED — and byte-decodes
    * both. The oracle recomputes dimensions and the palette-dereferenced
    * pixel checksum in plain SQL arithmetic, and pins that the interlaced
    * decode lands every row back in place (equal checksum column). A
    * decoder mis-reading the LZW width growth, a sub-block boundary, the
    * color table, or the interlace row map breaks the hash match. */
  def mmDecodeGif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orderedSpread(t(s, dir, "documents").select(col("doc_id")), "doc_id")
      .as[Long].map { d =>
      val w = (6 + d % 7).toInt; val h = (4 + d % 6).toInt
      val pal = new Array[Byte](24)
      var j = 0
      while (j < 8) {
        pal(j * 3) = ((j * 31 + d) % 256).toByte
        pal(j * 3 + 1) = ((j * 57 + 2 * d) % 256).toByte
        pal(j * 3 + 2) = ((j * 89 + 3 * d) % 256).toByte
        j += 1
      }
      val idx = Array.tabulate(w * h)(p =>
        (((p % w) + 2 * (p / w) + d) % 8).toByte)
      def sumRgb(rgb: Array[Byte]): Long = {
        var s0 = 0L; var i = 0
        while (i < rgb.length) {
          s0 += (rgb(i) & 0xff) + 2L * (rgb(i + 1) & 0xff) +
            3L * (rgb(i + 2) & 0xff)
          i += 3
        }
        s0
      }
      val mc = Multimodal.MediaCodec
      val (dw, dh, rgb) = mc.decodeGif(mc.encodeGif(w, h, pal, idx))
      val (_, _, rgbI) = mc.decodeGif(
        mc.encodeGif(w, h, pal, idx, interlace = true))
      (d, dw.toLong, dh.toLong, sumRgb(rgb), sumRgb(rgbI))
    }.toDF("doc_id", "gif_w", "gif_h", "gif_sum", "gif_interlaced_sum")
  }

  /** Baseline TIFF decode round-trip over REAL bytes (IFD walk + strip
    * decompression, zero codec libraries): per document the same integer-
    * generated RGB/gray/palette rasters ride through all three baseline
    * compressions — none, LZW (with and without the horizontal-
    * differencing predictor), PackBits — and byte-decode back. The oracle
    * recomputes dimensions and every checksum in plain SQL arithmetic;
    * the three compressions and the predictor variant must agree exactly
    * (equal-checksum columns + an exact-equality flag), so a bit-packing,
    * early-width-change, run-length, or predictor bug breaks the hash. */
  def mmDecodeTiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orderedSpread(t(s, dir, "documents").select(col("doc_id")), "doc_id")
      .as[Long].map { d =>
      val w = (7 + d % 6).toInt; val h = (5 + d % 5).toInt
      val rgb = new Array[Byte](w * h * 3)
      val gray = new Array[Byte](w * h)
      val idx = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = y * w + x
          rgb(p * 3) = ((x * 7 + y * 13 + d) % 256).toByte
          rgb(p * 3 + 1) = ((x * 3 + y * 5 + d * 11) % 256).toByte
          rgb(p * 3 + 2) = ((x + y + d) % 256).toByte
          gray(p) = ((x * 11 + y * 3 + d * 7) % 256).toByte
          idx(p) = ((x + 2 * y + d) % 16).toByte
          x += 1
        }
        y += 1
      }
      val pal = Array.tabulate(768) { i =>
        val j = i / 3
        ((j * (i % 3 match { case 0 => 31; case 1 => 57; case _ => 89 }) + d)
          % 256).toByte
      }
      def sumRgb(px: Array[Byte]): Long = {
        var s0 = 0L; var i = 0
        while (i < px.length) {
          s0 += (px(i) & 0xff) + 2L * (px(i + 1) & 0xff) + 3L * (px(i + 2) & 0xff)
          i += 3
        }
        s0
      }
      val mc = Multimodal.MediaCodec
      val (dw, dh, none) = mc.decodeTiff(mc.encodeTiff(w, h, 3, rgb, 1))
      val (_, _, lzw) = mc.decodeTiff(mc.encodeTiff(w, h, 3, rgb, 5))
      val (_, _, pack) = mc.decodeTiff(mc.encodeTiff(w, h, 3, rgb, 32773))
      val (_, _, pred) = mc.decodeTiff(
        mc.encodeTiff(w, h, 3, rgb, 5, predictor = 2))
      val predOk = java.util.Arrays.equals(pred, none) &&
        java.util.Arrays.equals(lzw, none) && java.util.Arrays.equals(pack, none)
      val (_, _, g) = mc.decodeTiff(mc.encodeTiff(w, h, 1, gray, 5))
      val (_, _, p) = mc.decodeTiff(
        mc.encodeTiff(w, h, 1, idx, 32773, palette = pal))
      (d, dw.toLong, dh.toLong, sumRgb(none), sumRgb(g), sumRgb(p),
        if (predOk) 1L else 0L)
    }.toDF("doc_id", "tif_w", "tif_h", "rgb_sum", "gray_sum", "pal_sum",
      "variants_identical")
  }

  // ------------------------------------------------------------------- maps

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact"          -> (ddExact _),
    "dd_ngram_jaccard"  -> (ddNgramJaccard _),
    "dd_minhash_lsh"    -> (ddMinhashLsh _),
    "dd_groups"         -> (ddGroups _),
    "pipe_clean_corpus" -> (pipeCleanCorpus _),
    "dd_simhash"        -> (ddSimhash _),
    "dd_simhash_rolling" -> (ddSimhashRolling _),
    "dd_embedding"      -> (ddEmbedding _),
    "dd_incremental"    -> (ddIncremental _),
    "dd_bloom_incremental" -> (ddBloomIncremental _),
    "tx_repetition"     -> (txRepetition _),
    "tx_redact"         -> (txRedact _),
    "pipe_decontaminate" -> (pipeDecontaminate _),
    "pipe_decontam_fuzzy" -> (pipeDecontaminateFuzzy _),
    "tx_classify"       -> (txClassify _),
    "pipe_pack_docs"    -> (pipePackDocs _),
    "pipe_sample_mix"   -> (pipeSampleMix _),
    "pipe_shuffle"      -> (pipeShuffle _),
    "pipe_source_filter" -> (pipeSourceFilter _),
    "pipe_chunk"        -> (pipeChunk _),
    "pipe_line_dedup"   -> (pipeLineDedup _),
    "pipe_substring_spans" -> (pipeSubstringSpans _),
    "pipe_substring_clean" -> (pipeSubstringClean _),
    "pipe_cluster_mix"  -> (pipeClusterMix _),
    "tx_doc_rarity"     -> (txDocRarity _),
    "pipe_bpe_pairs"    -> (pipeBpePairs _),
    "pipe_bpe_merge"    -> (pipeBpeMerge _),
    "pipe_bpe_train"    -> (pipeBpeTrain _),
    "pipe_bpe_train_batched" -> (pipeBpeTrainBatched _),
    "pipe_bpe_apply"    -> (pipeBpeApply _),
    "pipe_pack"         -> (pipePack _),
    "pipe_e2e"          -> (pipeE2e _),
    "sim_topk_brute"    -> (simTopkBrute _),
    "sim_topk_lsh"      -> (simTopkLsh _),
    "sim_topk_ivf"      -> (simTopkIvf _),
    "sim_topk_ivf_full" -> (simTopkIvfFull _),
    "sim_topk_sq"       -> (simTopkSq _),
    "sim_topk_sq_pruned" -> (simTopkSqPruned _),
    "tx_fingerprint_rolling" -> (txFingerprintRolling _),
    "tx_stats"          -> (txStats _),
    "tx_quality"        -> (txQuality _),
    "tx_langid"         -> (txLangid _),
    "tx_fingerprint"    -> (txFingerprint _),
    "mm_meta"           -> (mmMeta _),
    "mm_features"       -> (mmFeatures _),
    "mm_frames"         -> (mmFrames _),
    "mm_decode"         -> (mmDecode _),
    "mm_decode_png"     -> (mmDecodePng _),
    "mm_decode_jpeg"    -> (mmDecodeJpeg _),
    "mm_decode_gif"     -> (mmDecodeGif _),
    "mm_decode_tiff"    -> (mmDecodeTiff _),
  )

  /** Bench-only raw-operator bodies (NOT driver-contract queries): the
    * contract entries `dd_simhash` / `sim_topk_lsh` are audit harnesses —
    * they run the operator AND its bounded-error validation (a second full
    * hash pipeline, a brute-force recall sibling), so timing them measures
    * the audit, not the operator. These time the production operator alone.
    * Named with an `_op` suffix so BENCH_r08+ numbers are not misread as
    * comparable to the r6/r7 audit-inclusive `dd_simhash`/`sim_topk_lsh`
    * timings. */
  /** Memoized, MATERIALIZED IVF index per (session, sf dir), for the
    * probe-only bench entry: build-once-search-many is the operator's own
    * contract ([[graft.operators.Similarity.buildIvfIndex]] Scaladoc) — at
    * scale the assignment is a persisted table, so timing k-means training
    * inside every probe (as the contract query `sim_topk_sq` necessarily
    * does for the oracle) measures the build, not the search. The cached
    * `assigned` frame is persisted and counted so the first access pays the
    * whole build exactly once; keying by SESSION too means a stopped-and-
    * recreated SparkSession in the same JVM never serves a dead plan.
    * Bench builds it via [[benchSetup]] (untimed) and drops the pinned
    * executor storage via [[benchTeardown]] right after the entry's reps,
    * so the persist cannot evict other queries' scan cache. */
  private val ivfIndexCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Similarity.IvfIndex]
  private def prebuiltIvf(s: SparkSession, dir: String): Similarity.IvfIndex = {
    // purge entries owned by STOPPED sessions: if a teardown never ran
    // (setup threw, bench aborted, non-bench caller), the dead session and
    // its persisted frames must not stay strongly reachable for the JVM
    // lifetime — the storage itself died with the session, only the refs
    // linger
    ivfIndexCache.keys.filter(_._1.sparkContext.isStopped)
      .foreach(ivfIndexCache.remove)
    ivfIndexCache.getOrElseUpdate((s, dir), {
      val idx = Similarity.buildIvfIndex(
        t(s, dir, "embeddings"), "embedding", "vec_id", nlist = 64)
      val assigned = idx.assigned.persist()
      assigned.count()
      // the SQ8 code table is part of the index at scale — materialize it
      // too, so the probe's candidate stage scans int8 codes, not floats
      val codes = Similarity.sq8Codes(idx.copy(assigned = assigned)).persist()
      codes.count()
      idx.copy(assigned = assigned, codes = Some(codes))
    })
  }
  private def releaseIvf(s: SparkSession, dir: String): Unit =
    ivfIndexCache.remove((s, dir)).foreach { idx =>
      idx.assigned.unpersist()
      idx.codes.foreach(_.unpersist())
    }

  /** Untimed per-entry hooks for Bench: setup runs before an entry's timed
    * reps (index build on the MEASURED sf, not inside rep 1), teardown
    * right after (storage memory back to flat for the remaining entries). */
  val benchSetup: Map[String, (SparkSession, String) => Unit] = Map(
    "sim_topk_sq_ann" -> ((s, dir) => { prebuiltIvf(s, dir); () }))
  val benchTeardown: Map[String, (SparkSession, String) => Unit] = Map(
    "sim_topk_sq_ann" -> releaseIvf)

  val benchOps: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_simhash_op" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "text", "doc_id",
        n = 3, maxHamming = 16, hashAlgo = SimHash.AlgoXx)),
    "sim_topk_lsh_op" -> ((s, dir) => {
      val emb = embs(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "embedding", "vec_id", k = 5, planes = 4, dims = 64)
    }),
    // NAME BREAK (round 11): replaces r10's `sim_topk_sq_op`, which probed
    // ALL 8 cells of an nlist=8 index — a full int8 scan + re-rank that
    // measured no ANN pruning (1.68 s median, 0.52 s IQR). This probes 8 of
    // 64 cells, the operator's real scale shape (the full-probe recall
    // contract lives in `sim_topk_sq`/`sim_topk_ivf_full`). r10's
    // `sim_topk_sq_op` number is NOT comparable to this one.
    "sim_topk_sq_ann" -> ((s, dir) =>
      Similarity.ivfSqTopK(prebuiltIvf(s, dir),
        t(s, dir, "embeddings").filter(col("vec_id") < 10),
        "embedding", "vec_id", k = 5, nProbe = 8, rerankFactor = 4)),
  )

  private val shingleCte = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
      list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
      FROM toks)"""

  private val jaccardPairSql = shingleCte + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    ORDER BY id_a, id_b"""

  private val dotSql =
    "list_reduce(list_transform(range(1, 65), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)), (a, b) -> a + b)"
  private def dot(a: String, b: String) = dotSql.format(a, b)

  /** DuckDB replay of [[graft.operators.Multimodal.MediaCodec.decodeStub]]'s
    * payload fold: unsigned 64-bit residue kept in HUGEINT. */
  private val mediaHashSql = """
    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
      list_transform(regexp_extract_all(text, '[\s\S]'),
        ch -> CAST(ascii(ch) AS HUGEINT))),
      (acc, b) -> (acc*31 + b) % CAST(18446744073709551616 AS HUGEINT))"""

  private val bruteTopkSql = s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (
        SELECT query_id, neighbor_id,
          ${dot("qv", "cv")} / (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")})) AS cos
        FROM c JOIN q ON query_id != neighbor_id)
      SELECT query_id, rank, neighbor_id, cos FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Full SimHash replay in DuckDB: poly31 token hash in HUGEINT, per-bit
    * votes, 64-bit hash reassembly, 16-bit-block candidate bands, Hamming
    * verify — validated equal to an independent reference implementation.
    * Used both as `dd_simhash_rolling`'s exact oracle and as the portable
    * pair-count source in `dd_simhash`'s bounded-error oracle. */
  private val simhashRollingPairsSql: String = shingleCte + """
      , tok AS (SELECT doc_id, unnest(s) AS g FROM sh),
      th AS (SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS HUGEINT),
          list_transform(regexp_extract_all(g, '[\s\S]'),
            ch -> CAST(ascii(ch) AS HUGEINT))),
          (acc, b) -> (acc*31 + b) % CAST(18446744073709551616 AS HUGEINT)) AS h
        FROM tok),
      bits AS (SELECT doc_id, r.b AS b,
          SUM(CASE WHEN ((h >> CAST(r.b AS INTEGER)) & 1) = 1 THEN 1 ELSE -1 END) AS vote
        FROM th, range(64) r(b) GROUP BY doc_id, r.b),
      hu AS (SELECT d.doc_id,
          COALESCE((SELECT SUM(CASE WHEN vote > 0
              THEN CAST(1 AS HUGEINT) << CAST(b AS INTEGER)
              ELSE CAST(0 AS HUGEINT) END)
            FROM bits WHERE bits.doc_id = d.doc_id), CAST(0 AS HUGEINT)) AS h
        FROM (SELECT DISTINCT doc_id FROM documents) d),
      hs AS (SELECT doc_id, h,
          CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
               THEN h - CAST(18446744073709551616 AS HUGEINT) ELSE h END AS BIGINT) AS sh
        FROM hu)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
      FROM hs a JOIN hs b ON a.doc_id < b.doc_id
      WHERE (((a.h >> 0) & 65535) = ((b.h >> 0) & 65535)
          OR ((a.h >> 16) & 65535) = ((b.h >> 16) & 65535)
          OR ((a.h >> 32) & 65535) = ((b.h >> 32) & 65535)
          OR ((a.h >> 48) & 65535) = ((b.h >> 48) & 65535))
        AND bit_count(xor(a.sh, b.sh)) <= 16
      ORDER BY id_a, id_b"""

  /** DuckDB replay of [[Corpus.bpeTrain]]: `rounds` macro-expanded copies
    * of the single-round merge replay (winner over the well-formed pair
    * universe + greedy run-parity apply), each round's CTEs suffixed and
    * chained on the previous round's re-tokenized output. Generated, not
    * hand-written, so the per-round SQL is bit-identical to the
    * `pipe_bpe_merge` oracle it extends. */
  private def bpeTrainOracleSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""
      winp$r AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT concat(t[i], ' ', t[i+1]) AS pair
              FROM cur${r - 1}, unnest(range(1, len(t))) AS u$r(i)
              WHERE len(t) >= 2)
        WHERE len(string_split(pair, ' ')) = 2
          AND string_split(pair, ' ')[1] <> ''
          AND string_split(pair, ' ')[2] <> ''
        GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
      win$r AS (SELECT string_split(pair, ' ')[1] AS a,
                       string_split(pair, ' ')[2] AS b, cnt FROM winp$r),
      pos$r AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
                FROM cur${r - 1}),
      flags$r AS (SELECT doc_id, i, t[i] AS tk,
          CASE WHEN i < len(t) AND t[i] = (SELECT a FROM win$r)
                AND t[i+1] = (SELECT b FROM win$r) THEN 1 ELSE 0 END AS m
        FROM pos$r),
      runs$r AS (SELECT doc_id, i, tk, m,
          CASE WHEN m = 1 THEN i - ROW_NUMBER() OVER (
            PARTITION BY doc_id, m ORDER BY i) END AS run_id
        FROM flags$r),
      decide$r AS (SELECT doc_id, i, tk, m,
          CASE WHEN m = 1 AND (ROW_NUMBER() OVER (
              PARTITION BY doc_id, run_id ORDER BY i) % 2) = 1
            THEN 1 ELSE 0 END AS mrg
        FROM runs$r),
      nm$r AS (SELECT CAST(coalesce(sum(mrg), 0) AS BIGINT) AS n
               FROM decide$r),
      out$r AS (SELECT doc_id, i, mrg,
          CASE WHEN mrg = 1 THEN (SELECT a || b FROM win$r)
               WHEN LAG(mrg, 1, 0) OVER (
                 PARTITION BY doc_id ORDER BY i) = 1 THEN NULL
               ELSE tk END AS otk
        FROM decide$r),
      cur$r AS (SELECT doc_id,
          string_split(coalesce(string_agg(otk, ' ' ORDER BY i), ''), ' ') AS t
        FROM out$r GROUP BY doc_id)"""
    }.mkString(",")
    val roundRows = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
        (SELECT a FROM win$r) AS pair_a, (SELECT b FROM win$r) AS pair_b,
        (SELECT cnt FROM win$r) AS cnt, (SELECT n FROM nm$r) AS n_merges"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
      WITH cur0 AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
                    FROM documents),$roundCtes
      SELECT * FROM ($roundRows) ORDER BY round"""
  }

  /** Same macro-expanded round replay as [[bpeTrainOracleSql]], but the
    * result is the ENCODED CORPUS after the final round — what
    * [[Corpus.bpeApplyMerges]] produces when fed its own trainer's merge
    * table (self-trained ranks are causal, so min-rank-iterate encoding
    * equals the trainer's sequential rounds). */
  private def bpeApplyOracleSql(rounds: Int): String = {
    val trainSql = bpeTrainOracleSql(rounds)
    val ctesEnd = trainSql.lastIndexOf("SELECT * FROM")
    trainSql.substring(0, ctesEnd) +
      s"""SELECT doc_id,
        coalesce(string_agg(otk, ' ' ORDER BY i), '') AS tokenized_text,
        CAST(count(*) - sum(mrg) AS BIGINT) AS n_tokens
      FROM out$rounds GROUP BY doc_id ORDER BY doc_id"""
  }

  /** DuckDB replay of [[Corpus.bpeTrainBatched]]: per round, the ranked
    * top-`window` well-formed candidate list, the SEQUENTIAL compatibility
    * filter as a recursive CTE whose state carries the used-token set
    * (accept iff none of {a, b, a+b} was claimed by an earlier acceptance,
    * until `batch` accepted), then ONE simultaneous greedy apply — the
    * same run-parity trick as the single-pair replay (consecutive matches
    * exist only for (x,x) pairs; distinct accepted pairs share no token,
    * so their matches never overlap) with the merged token rebuilt from
    * the position's own (tk, tk2). Per-pair merge counts come from the
    * decide flags keyed by the pair's text. */
  private def bpeTrainBatchedOracleSql(rounds: Int, batch: Int,
      window: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val ok = s"""s.n_acc < $batch AND NOT list_contains(s.used, c.a)
              AND NOT list_contains(s.used, c.b)
              AND NOT list_contains(s.used, c.a || c.b)"""
      s"""
      candp$r AS (SELECT pair, cnt,
          CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rn
        FROM (SELECT pair, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT concat(t[i], ' ', t[i+1]) AS pair
                    FROM cur${r - 1}, unnest(range(1, len(t))) AS u$r(i)
                    WHERE len(t) >= 2)
              WHERE len(string_split(pair, ' ')) = 2
                AND string_split(pair, ' ')[1] <> ''
                AND string_split(pair, ' ')[2] <> ''
              GROUP BY pair ORDER BY cnt DESC, pair LIMIT $window)),
      cand$r AS (SELECT rn, string_split(pair, ' ')[1] AS a,
                        string_split(pair, ' ')[2] AS b, cnt FROM candp$r),
      acc$r AS (
        SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS VARCHAR[]) AS used,
               0 AS n_acc, CAST(NULL AS VARCHAR) AS a,
               CAST(NULL AS VARCHAR) AS b, CAST(NULL AS BIGINT) AS cnt,
               0 AS took
        UNION ALL
        SELECT c.rn,
          CASE WHEN $ok
            THEN list_concat(s.used, [c.a, c.b, c.a || c.b]) ELSE s.used END,
          CASE WHEN $ok THEN s.n_acc + 1 ELSE s.n_acc END,
          c.a, c.b, c.cnt,
          CASE WHEN $ok THEN 1 ELSE 0 END
        FROM acc$r s JOIN cand$r c ON c.rn = s.rn + 1),
      win$r AS (SELECT CAST(row_number() OVER (ORDER BY rn) AS BIGINT) AS rk,
                       a, b, cnt FROM acc$r WHERE took = 1),
      pos$r AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
                FROM cur${r - 1}),
      flags$r AS (SELECT doc_id, i, t[i] AS tk,
          CASE WHEN i < len(t) THEN t[i+1] ELSE NULL END AS tk2,
          CASE WHEN i < len(t) AND EXISTS (SELECT 1 FROM win$r w
               WHERE w.a = t[i] AND w.b = t[i+1]) THEN 1 ELSE 0 END AS m
        FROM pos$r),
      runs$r AS (SELECT doc_id, i, tk, tk2, m,
          CASE WHEN m = 1 THEN i - ROW_NUMBER() OVER (
            PARTITION BY doc_id, m ORDER BY i) END AS run_id
        FROM flags$r),
      decide$r AS (SELECT doc_id, i, tk, tk2, m,
          CASE WHEN m = 1 AND (ROW_NUMBER() OVER (
              PARTITION BY doc_id, run_id ORDER BY i) % 2) = 1
            THEN 1 ELSE 0 END AS mrg
        FROM runs$r),
      nm$r AS (SELECT w.rk, w.a, w.b, w.cnt,
          CAST(coalesce((SELECT sum(d.mrg) FROM decide$r d
            WHERE d.tk = w.a AND d.tk2 = w.b), 0) AS BIGINT) AS n
        FROM win$r w),
      out$r AS (SELECT doc_id, i, mrg,
          CASE WHEN mrg = 1 THEN tk || tk2
               WHEN LAG(mrg, 1, 0) OVER (
                 PARTITION BY doc_id ORDER BY i) = 1 THEN NULL
               ELSE tk END AS otk
        FROM decide$r),
      cur$r AS (SELECT doc_id,
          string_split(coalesce(string_agg(otk, ' ' ORDER BY i), ''), ' ') AS t
        FROM out$r GROUP BY doc_id)"""
    }.mkString(",")
    val roundRows = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round, rk AS rank, a AS pair_a,
           b AS pair_b, cnt, n AS n_merges FROM nm$r"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
      WITH RECURSIVE cur0 AS (SELECT doc_id,
          string_split(coalesce(text, ''), ' ') AS t FROM documents),$roundCtes
      SELECT * FROM ($roundRows) ORDER BY round, rank"""
  }

  val oracle: Map[String, String] = Map(
    "pipe_bpe_train" -> bpeTrainOracleSql(3),
    "pipe_bpe_train_batched" -> bpeTrainBatchedOracleSql(2, 3, 24),
    "pipe_bpe_apply" -> bpeApplyOracleSql(3),
    "dd_exact" -> """
      SELECT doc_id,
        COUNT(*) OVER (PARTITION BY text) AS n_copies,
        MIN(doc_id) OVER (PARTITION BY text) AS canonical_id,
        doc_id = MIN(doc_id) OVER (PARTITION BY text) AS is_canonical
      FROM documents ORDER BY doc_id""",
    // the increment collapses to min-id canonicals, then drops anything
    // whose content already exists in history — replayed with plain text
    // equality (the operator's fingerprint equality means exactly this)
    "dd_incremental" -> """
      WITH inc AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
      hist AS (SELECT DISTINCT text FROM documents WHERE doc_id % 5 <> 0),
      canon AS (SELECT doc_id, text, lang, source FROM (
          SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS cid FROM inc)
        WHERE doc_id = cid)
      SELECT doc_id, text, lang, source FROM canon
      WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.text = canon.text)
      ORDER BY doc_id""",
    "dd_bloom_incremental" -> """
      WITH inc AS (SELECT * FROM documents
        WHERE doc_id % 7 = 0 OR (doc_id % 7 <> 0 AND doc_id % 97 = 3)),
      hist AS (SELECT DISTINCT text FROM documents WHERE doc_id % 7 <> 0),
      canon AS (SELECT doc_id, text, lang, source FROM (
          SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS cid FROM inc)
        WHERE doc_id = cid)
      SELECT doc_id, text, lang, source FROM canon
      WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.text = canon.text)
      ORDER BY doc_id""",
    "dd_ngram_jaccard" -> jaccardPairSql,
    // MinHash-LSH detects the same pair set (recall ≈ 1 at J ≥ 0.5 with
    // k=64/bands=16 on this corpus — validated), so the exact-Jaccard SQL
    // is its oracle too.
    "dd_minhash_lsh" -> jaccardPairSql,
    // duplicate groups: DuckDB replays the transitive closure over the
    // exact-Jaccard pair graph with a recursive CTE; min reachable id is
    // the component label (graph is undirected, so min-reachable = min of
    // the component)
    "dd_groups" -> (shingleCte.replace("WITH ", "WITH RECURSIVE ") + """
      , pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT src AS id, src AS label FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id)
      SELECT id, MIN(label) AS group_id FROM reach GROUP BY id ORDER BY id"""),
    "tx_stats" -> """
      SELECT doc_id,
        CAST(length(text) AS DOUBLE) AS n_chars,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
        (CAST(length(text) AS DOUBLE) - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
        CAST(len(list_intersect(list_distinct(string_split(lower(text), ' ')),
          ['the','and','of','to','a','in','is','it','that','for'])) AS DOUBLE) AS stopword_hits,
        CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) AS punct_count,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS INT) AS n_tokens_bpe
      FROM documents ORDER BY doc_id""",
    "pipe_clean_corpus" -> """
      WITH RECURSIVE q AS (
        SELECT doc_id, text,
          (CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
           + CASE WHEN (CAST(length(text) AS DOUBLE) - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
                / CAST(len(string_split(text, ' ')) AS DOUBLE) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END
           + CASE WHEN CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                / CAST(length(text) AS DOUBLE) <= 0.2 THEN 1.0 ELSE 0.0 END) / 3.0 AS quality
        FROM documents),
      qs AS (SELECT * FROM q WHERE quality >= 2.0/3.0),
      canon AS (
        SELECT doc_id, text, quality FROM (
          SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS cid FROM qs)
        WHERE doc_id = cid),
      toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM canon),
      sh AS (SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
          i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT src AS id, src AS label FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
      labels AS (SELECT id, MIN(label) AS group_id FROM reach GROUP BY id)
      SELECT c.doc_id, c.quality
      FROM canon c LEFT JOIN labels l ON c.doc_id = l.id
      WHERE l.group_id IS NULL OR l.group_id = c.doc_id
      ORDER BY c.doc_id""",
    "tx_quality" -> """
      SELECT doc_id,
        (CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
         + CASE WHEN (CAST(length(text) AS DOUBLE) - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
              / CAST(len(string_split(text, ' ')) AS DOUBLE) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END
         + CASE WHEN CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
              / CAST(length(text) AS DOUBLE) <= 0.2 THEN 1.0 ELSE 0.0 END) / 3.0 AS quality
      FROM documents ORDER BY doc_id""",
    "tx_langid" -> """
      WITH scored AS (SELECT doc_id, text,
        len(list_intersect(list_distinct(string_split(lower(text), ' ')),
          ['the','and','of','to','a','in','is','it','that','for'])) AS s_en,
        len(list_intersect(list_distinct(string_split(lower(text), ' ')),
          ['der','die','das','und','ist','nicht','ein','zu','mit','auf'])) AS s_de,
        len(list_intersect(list_distinct(string_split(lower(text), ' ')),
          ['le','la','les','et','est','un','une','des','que','pour'])) AS s_fr,
        len(list_intersect(list_distinct(string_split(lower(text), ' ')),
          ['el','los','las','es','y','un','una','de','que','por'])) AS s_es
        FROM documents)
      SELECT doc_id,
        CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
             WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
             WHEN s_es > 0 THEN 'es'
             ELSE 'und' END AS lang_pred
      FROM scored ORDER BY doc_id""",
    "mm_meta" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS media_type,
        CAST(strlen(text) AS BIGINT) AS byte_len
      FROM documents ORDER BY doc_id""",
    // full SimHash replay: poly31 token hash in HUGEINT, per-bit votes,
    // 64-bit hash reassembly, 16-bit-block candidate bands, Hamming verify —
    // validated equal to an independent reference implementation
    "dd_simhash_rolling" -> simhashRollingPairsSql,
    // byte-for-byte replay of the redaction chain (same RE2-compatible
    // patterns, same order); counts come from the PRE-redaction text
    "tx_redact" -> """
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
          '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b', '<PHONE>', 'g'),
          '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS clean,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        CAST(len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssn,
        CAST(len(regexp_extract_all(text, '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b')) AS INT) AS n_phone,
        CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ip
      FROM documents ORDER BY doc_id""",
    "tx_repetition" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      g AS (SELECT doc_id, t,
        list_transform(range(1, greatest(len(t) - 1, 0) + 1),
          i -> concat(t[i], ' ', t[i+1])) AS g
        FROM t),
      dup AS (SELECT doc_id,
          1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_word_frac,
          len(g) AS n_grams FROM g),
      tg AS (SELECT doc_id, unnest(g) AS gram FROM g),
      cnt AS (SELECT doc_id, gram, count(*) AS c FROM tg GROUP BY 1, 2),
      top AS (SELECT doc_id, max(c) AS tc FROM cnt GROUP BY 1)
      SELECT d.doc_id, d.dup_word_frac,
        CASE WHEN d.n_grams > 0 THEN CAST(t.tc AS DOUBLE) / d.n_grams
             ELSE 0.0 END AS top_ngram_frac
      FROM dup d LEFT JOIN top t ON d.doc_id = t.doc_id
      ORDER BY d.doc_id""",
    // boundary-aware packing: the greedy per-bucket fill is a sequential
    // recurrence — a RECURSIVE CTE steps it document by document from a
    // synthetic rn=0 state row per bucket; global ids chain through the
    // same cumulative per-bucket census the operator uses (L = 128, 8
    // id-range buckets, width replayed from the min-NORMALIZED id span —
    // the same (id - min) // width assignment the operator computes, so
    // offset id spaces replay identically)
    "pipe_pack_docs" -> """
      WITH RECURSIVE w AS (
        SELECT min(doc_id) AS mn,
               GREATEST(1, (max(doc_id) - min(doc_id) + 8) // 8) AS wd
        FROM documents),
      d AS (SELECT doc_id,
              CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n,
              CAST((doc_id - (SELECT mn FROM w)) // (SELECT wd FROM w) AS INT) AS b
            FROM documents),
      ord AS (SELECT *, row_number() OVER (PARTITION BY b ORDER BY doc_id) AS rn
              FROM d),
      rec AS (
        SELECT b, CAST(0 AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS doc_id,
               CAST(NULL AS BIGINT) AS ls, CAST(NULL AS BIGINT) AS off,
               CAST(NULL AS BIGINT) AS lsend,
               CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS f
        FROM (SELECT DISTINCT b FROM ord)
        UNION ALL
        SELECT o.b, o.rn, o.doc_id,
          CASE WHEN o.n > 128 THEN (CASE WHEN r.f > 0 THEN r.s + 1 ELSE r.s END)
               WHEN r.f + o.n > 128 THEN r.s + 1
               ELSE r.s END,
          CASE WHEN o.n > 128 OR r.f + o.n > 128 THEN 0 ELSE r.f END,
          CASE WHEN o.n > 128 THEN (CASE WHEN r.f > 0 THEN r.s + 1 ELSE r.s END)
                 + (o.n + 127) // 128 - 1
               WHEN r.f + o.n > 128 THEN r.s + 1
               ELSE r.s END,
          CASE WHEN o.n > 128 THEN (CASE WHEN r.f > 0 THEN r.s + 1 ELSE r.s END)
                 + (o.n + 127) // 128
               WHEN r.f + o.n > 128 THEN (CASE WHEN o.n = 128 THEN r.s + 2
                                               ELSE r.s + 1 END)
               WHEN r.f + o.n = 128 THEN r.s + 1
               ELSE r.s END,
          CASE WHEN o.n > 128 THEN 0
               WHEN r.f + o.n > 128 THEN (CASE WHEN o.n = 128 THEN 0 ELSE o.n END)
               WHEN r.f + o.n = 128 THEN 0
               ELSE r.f + o.n END
        FROM rec r JOIN ord o ON o.b = r.b AND o.rn = r.rn + 1),
      asg AS (SELECT b, doc_id, ls, off, lsend FROM rec WHERE rn > 0),
      census AS (SELECT b, max(lsend) + 1 AS cnt FROM asg GROUP BY b),
      offs AS (SELECT b, COALESCE(SUM(cnt) OVER (ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff
               FROM census)
      SELECT a.doc_id, CAST(o.boff + a.ls AS BIGINT) AS seq_id,
             CAST(a.off AS BIGINT) AS seq_offset
      FROM asg a JOIN offs o USING (b)
      ORDER BY a.doc_id""",
    // hashed-linear classifier: token poly31 hash -> bucket -> weight sum,
    // all integer, replayed with nested SQL lambdas over the SAME literal
    // weight list the Spark side carries
    "tx_classify" -> s"""
      WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
                    FROM documents),
      sc AS (SELECT doc_id,
        3 + list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(t, tok ->
          [${ClassifierWeights.mkString(", ")}][
            CAST(((list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(tok, '[^\\n]'),
                  ch -> CAST(ascii(ch) AS BIGINT))),
              (acc, x) -> (acc*31 + x) % 1000000007)
              * 2654435761) % 1000000007) % ${ClassifierWeights.length}
              AS INT) + 1])),
          (acc, x) -> acc + x) AS score
        FROM toks)
      SELECT doc_id, CAST(score AS BIGINT) AS score, score >= 0 AS kept
      FROM sc ORDER BY doc_id""",
    // fuzzy decontamination: exact all-pairs Jaccard vs the benchmark set
    // (empty-shingle docs can never match; a benchmark doc matches itself)
    "pipe_decontam_fuzzy" -> (shingleCte + """
      , shf AS (SELECT * FROM sh WHERE len(s) > 0),
      bench AS (SELECT * FROM shf WHERE doc_id % 17 = 0),
      hit AS (SELECT DISTINCT a.doc_id FROM shf a JOIN bench b ON
                CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM hit)
      ORDER BY doc_id"""),
    "pipe_decontaminate" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
          i -> concat(t[i], ' ', t[i+1], ' ', t[i+2], ' ', t[i+3], ' ', t[i+4]))) AS s
        FROM toks),
      bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 17 = 0),
      cg AS (SELECT doc_id, unnest(s) AS g FROM sh)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT DISTINCT cg.doc_id FROM cg JOIN bench USING (g))
      ORDER BY doc_id""",
    "pipe_sample_mix" -> """
      WITH u AS (SELECT doc_id, lang,
        CAST((list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(regexp_extract_all(CAST(doc_id AS VARCHAR), '[^\n]'),
            ch -> CAST(ascii(ch) AS BIGINT))),
          (acc, x) -> (acc*31 + x) % 1000000007)
          * 2654435761) % 1000000007 AS DOUBLE) / 1000000007.0 AS u
        FROM documents)
      SELECT doc_id, lang FROM u
      WHERE u < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.75
                          WHEN 'es' THEN 0.75 ELSE 1.0 END
      ORDER BY doc_id""",
    // the BPE counting kernel replayed exactly: adjacent pairs with
    // multiplicity, count-desc/pair-asc top-100
    "pipe_bpe_pairs" -> """
      WITH toks AS (SELECT string_split(coalesce(text, ''), ' ') AS t
                    FROM documents),
      pairs AS (SELECT concat(t[i], ' ', t[i+1]) AS pair
                FROM toks, unnest(range(1, len(t))) AS u(i)
                WHERE len(t) >= 2)
      SELECT pair, CAST(count(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY pair
      ORDER BY cnt DESC, pair LIMIT 100""",
    // one BPE merge round replayed exactly: same winner (count-desc,
    // pair-asc, well-formed pairs only), greedy leftmost-non-overlapping
    // apply via run-parity (consecutive matches exist only for (x,x)
    // pairs; even run offsets merge, odd ones are consumed)
    "pipe_bpe_merge" -> """
      WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
                    FROM documents),
      allp AS (SELECT concat(t[i], ' ', t[i+1]) AS pair
               FROM toks, unnest(range(1, len(t))) AS u(i)
               WHERE len(t) >= 2),
      winner AS (
        SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
        FROM (SELECT pair, count(*) AS cnt FROM allp
              WHERE len(string_split(pair, ' ')) = 2
                AND string_split(pair, ' ')[1] <> ''
                AND string_split(pair, ' ')[2] <> ''
              GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1)),
      pos AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks),
      flags AS (SELECT doc_id, i, t[i] AS tk,
                  CASE WHEN i < len(t) AND t[i] = (SELECT a FROM winner)
                        AND t[i+1] = (SELECT b FROM winner)
                       THEN 1 ELSE 0 END AS m
                FROM pos),
      runs AS (SELECT doc_id, i, tk, m,
                 CASE WHEN m = 1 THEN i - ROW_NUMBER() OVER (
                   PARTITION BY doc_id, m ORDER BY i) END AS run_id
               FROM flags),
      decide AS (SELECT doc_id, i, tk, m,
                   CASE WHEN m = 1 AND (ROW_NUMBER() OVER (
                       PARTITION BY doc_id, run_id ORDER BY i) % 2) = 1
                     THEN 1 ELSE 0 END AS mrg
                 FROM runs),
      out AS (SELECT doc_id, i, mrg,
                CASE WHEN mrg = 1 THEN (SELECT a || b FROM winner)
                     WHEN LAG(mrg, 1, 0) OVER (
                       PARTITION BY doc_id ORDER BY i) = 1 THEN NULL
                     ELSE tk END AS otk
              FROM decide)
      SELECT doc_id,
        coalesce(string_agg(otk, ' ' ORDER BY i), '') AS merged_text,
        CAST(sum(mrg) AS BIGINT) AS n_merges,
        CAST(count(*) AS BIGINT) AS n_tokens_before,
        CAST(count(*) - sum(mrg) AS BIGINT) AS n_tokens_after
      FROM out GROUP BY doc_id ORDER BY doc_id""",
    // cluster-balance replayed as the NAIVE exact form — full per-cluster
    // ranking — pinning that Spark's two-pass bin selection (no global
    // per-cluster sort) returns exactly the top-16 by (u, vec_id)
    "pipe_cluster_mix" -> """
      WITH key AS (SELECT vec_id,
        CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
           + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
           + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
           + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS BIGINT)
          AS cluster,
        (list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(regexp_extract_all(CAST(vec_id AS VARCHAR), '[^\n]'),
            ch -> CAST(ascii(ch) AS BIGINT))),
          (acc, x) -> (acc*31 + x) % 1000000007)
          * 2654435761) % 1000000007 AS u
        FROM embeddings),
      r AS (SELECT vec_id, cluster,
              row_number() OVER (PARTITION BY cluster ORDER BY u, vec_id) AS rn
            FROM key)
      SELECT vec_id, cluster FROM r WHERE rn <= 16 ORDER BY vec_id""",
    // token-rarity quality scores replayed exactly (all-integer contract)
    "tx_doc_rarity" -> """
      WITH toks AS (SELECT doc_id,
        unnest(string_split(coalesce(text, ''), ' ')) AS tok FROM documents),
      freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS f
               FROM toks GROUP BY tok)
      SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(min(f) AS BIGINT) AS min_freq,
        CAST(sum(f) AS BIGINT) AS sum_freq
      FROM toks JOIN freq USING (tok)
      GROUP BY doc_id ORDER BY doc_id""",
    // repeated-span detection replayed: 10-token windows, corpus-first
    // canonical (min doc_id, pos), overlapping/adjacent flags merged via
    // gaps-and-islands — DuckDB groups by the window TEXT where Spark
    // groups by its 128-bit fingerprint (identical up to negligible
    // collisions)
    "pipe_substring_spans" -> """
      WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
                    FROM documents),
      wins AS (SELECT doc_id, i AS pos, array_to_string(t[i+1:i+10], ' ') AS win
               FROM toks, unnest(range(0, greatest(len(t)-9, 0))) AS u(i)),
      flagged AS (SELECT doc_id, pos FROM (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
          FROM wins) WHERE rn > 1),
      m AS (SELECT doc_id, pos,
              CASE WHEN pos > coalesce(max(pos + 10) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
            FROM flagged),
      isl AS (SELECT doc_id, pos, sum(new_island) OVER (
                PARTITION BY doc_id ORDER BY pos) AS island FROM m)
      SELECT doc_id, min(pos) AS span_start, max(pos) + 10 AS span_end,
             CAST(count(*) AS BIGINT) AS n_windows
      FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""",
    // the rewrite replayed: same spans, then token i survives unless a
    // span covers it (DuckDB lambda indices are 1-based, hence i-1)
    "pipe_substring_clean" -> """
      WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
                    FROM documents),
      wins AS (SELECT doc_id, i AS pos, array_to_string(t[i+1:i+10], ' ') AS win
               FROM toks, unnest(range(0, greatest(len(t)-9, 0))) AS u(i)),
      flagged AS (SELECT doc_id, pos FROM (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
          FROM wins) WHERE rn > 1),
      m AS (SELECT doc_id, pos,
              CASE WHEN pos > coalesce(max(pos + 10) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
            FROM flagged),
      isl AS (SELECT doc_id, pos, sum(new_island) OVER (
                PARTITION BY doc_id ORDER BY pos) AS island FROM m),
      spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 10 AS e
                FROM isl GROUP BY doc_id, island),
      sp AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp
             FROM spans GROUP BY doc_id)
      SELECT t.doc_id,
        coalesce(array_to_string(list_filter(t.t, (tok, i) ->
          sp.sp IS NULL OR
          len(list_filter(sp.sp, r -> (i-1) >= r.s AND (i-1) < r.e)) = 0),
          ' '), '') AS clean_text,
        CAST(len(t.t) AS BIGINT) AS n_tokens,
        CAST(len(t.t) - len(list_filter(t.t, (tok, i) ->
          sp.sp IS NULL OR
          len(list_filter(sp.sp, r -> (i-1) >= r.s AND (i-1) < r.e)) = 0))
          AS BIGINT) AS n_tokens_removed
      FROM toks t LEFT JOIN sp ON t.doc_id = sp.doc_id
      ORDER BY t.doc_id""",
    // re-lining + boilerplate cut replayed: 3-token lines, lines present in
    // ≥2 distinct docs dropped everywhere, survivors rejoined in order
    "pipe_line_dedup" -> """
      WITH lined AS (
        SELECT doc_id, array_to_string(list_transform(
            range(0, greatest(CAST(ceil(len(t)/3.0) AS INT), 1)),
            i -> array_to_string(t[i*3+1:i*3+3], ' ')), chr(10)) AS text
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      freq AS (SELECT line FROM (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS line
          FROM lined)
        GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
      bl AS (SELECT coalesce(list(line), []) AS b FROM freq)
      SELECT doc_id,
        coalesce(array_to_string(list_filter(string_split(text, chr(10)),
          l -> NOT list_contains(b, l)), chr(10)), '') AS clean_text,
        CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        CAST(len(list_filter(string_split(text, chr(10)),
          l -> NOT list_contains(b, l))) AS BIGINT) AS n_lines_kept
      FROM lined, bl ORDER BY doc_id""",
    // the same deterministic slicing replayed: chunks advance by 48 with
    // ceil(max(n-64,0)/48)+1 chunks per doc, last chunk keeps the tail
    "pipe_chunk" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      c AS (SELECT doc_id, tk,
        unnest(range(0, CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS BIGINT) + 1))
          AS chunk_idx
        FROM t)
      SELECT doc_id, chunk_idx,
        array_to_string(list_slice(tk, chunk_idx*48 + 1, chunk_idx*48 + 64), ' ')
          AS chunk_text,
        CAST(len(list_slice(tk, chunk_idx*48 + 1, chunk_idx*48 + 64)) AS BIGINT)
          AS n_tokens
      FROM c ORDER BY doc_id, chunk_idx""",
    // all five pipeline stages replayed: source share test, 5-gram
    // decontamination, exact-dup canon, chunk slicing, packing cut points
    "pipe_e2e" -> """
      WITH keep AS (
        SELECT source FROM documents GROUP BY source
        HAVING SUM(CASE WHEN len(string_split(text, ' ')) < 40
                        THEN 1 ELSE 0 END) * 10 < COUNT(*) * 4),
      sf AS (SELECT * FROM documents WHERE source IN (SELECT source FROM keep)),
      btoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      bsh AS (SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
          i -> concat(t[i], ' ', t[i+1], ' ', t[i+2], ' ', t[i+3], ' ', t[i+4]))) AS s
        FROM btoks),
      bench AS (SELECT DISTINCT unnest(s) AS g FROM bsh WHERE doc_id % 17 = 0),
      cg AS (SELECT doc_id, unnest(s) AS g FROM bsh),
      contaminated AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bench USING (g)),
      dc AS (SELECT * FROM sf
             WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      canon AS (SELECT doc_id, text FROM (
          SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS cid FROM dc)
        WHERE doc_id = cid),
      tt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM canon),
      c AS (SELECT doc_id, tk,
        unnest(range(0, CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS BIGINT) + 1))
          AS chunk_idx
        FROM tt),
      ch AS (SELECT doc_id, chunk_idx,
        CAST(len(list_slice(tk, chunk_idx*48 + 1, chunk_idx*48 + 64)) AS BIGINT)
          AS n_tokens
        FROM c),
      p AS (SELECT doc_id, chunk_idx, n_tokens,
        COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s2
        FROM ch)
      SELECT doc_id, chunk_idx, n_tokens,
        CAST(s2 // 256 AS BIGINT) AS seq_id,
        CAST(s2 % 256 AS BIGINT) AS seq_offset
      FROM p ORDER BY doc_id, chunk_idx""",
    // the packing replayed as ONE windowed running sum over the same chunk
    // stream — integer cut points, bit-exact in any engine
    "pipe_pack" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      c AS (SELECT doc_id, tk,
        unnest(range(0, CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS BIGINT) + 1))
          AS chunk_idx
        FROM t),
      ch AS (SELECT doc_id, chunk_idx,
        CAST(len(list_slice(tk, chunk_idx*48 + 1, chunk_idx*48 + 64)) AS BIGINT)
          AS n_tokens
        FROM c),
      p AS (SELECT doc_id, chunk_idx, n_tokens,
        COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        FROM ch)
      SELECT doc_id, chunk_idx, n_tokens,
        CAST(s // 256 AS BIGINT) AS seq_id,
        CAST(s % 256 AS BIGINT) AS seq_offset
      FROM p ORDER BY doc_id, chunk_idx""",
    // integer cross-multiplied share test: bit-exact replay, no float
    // threshold boundary
    "pipe_source_filter" -> """
      WITH keep AS (
        SELECT source FROM documents GROUP BY source
        HAVING SUM(CASE WHEN len(string_split(text, ' ')) < 40
                        THEN 1 ELSE 0 END) * 10 < COUNT(*) * 4)
      SELECT doc_id, source FROM documents
      WHERE source IN (SELECT source FROM keep)
      ORDER BY doc_id""",
    // the same md5 permutation replayed directly — a hash match proves the
    // bucketed rank assignment equals the global sort it avoids
    "pipe_shuffle" -> """
      SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || 'ep1'),
                           doc_id) - 1 AS shuffle_rank
      FROM documents ORDER BY shuffle_rank""",
    // banded multi-table hyperplane LSH with an exact-cosine verify step:
    // candidate recall is exactly 1.0 on this corpus (validated against the
    // quadratic ground truth) and verification admits no false positives,
    // so the all-pairs SQL is a true oracle — same pattern as dd_minhash_lsh
    "dd_embedding" -> s"""
      WITH v AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
      scored AS (
        SELECT a.id AS id_a, b.id AS id_b,
          ${dot("a.e", "b.e")} / (sqrt(${dot("a.e", "a.e")}) * sqrt(${dot("b.e", "b.e")})) AS cos
        FROM v a JOIN v b ON a.id < b.id)
      SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.2
      ORDER BY id_a, id_b""",
    "sim_topk_brute" -> bruteTopkSql,
    // bounded-error oracles: DuckDB recomputes the exact/portable side
    // (pair count, query list, canonical-text count) independently; the
    // ok-flags are literal 1s — Spark zeroes them when the measured
    // error exceeds the documented bound, failing the hash match
    "dd_simhash" -> ("""
      SELECT CAST(count(*) AS BIGINT) AS n_pairs_portable,
        CAST(1 AS BIGINT) AS overlap_ok, CAST(1 AS BIGINT) AS recall_ok,
        CAST(1 AS BIGINT) AS precision_ok
      FROM (""" + simhashRollingPairsSql + ")"),
    "sim_topk_lsh" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
        CAST(count(*) * 5 AS BIGINT) AS n_hits,
        CAST(1 AS BIGINT) AS ranked_ok, CAST(1 AS BIGINT) AS hits_valid,
        CAST(1 AS BIGINT) AS recall_ok
      FROM embeddings WHERE vec_id < 10""",
    "sim_topk_ivf" -> """
      SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_hits,
        CAST(1 AS BIGINT) AS recall_ok
      FROM embeddings WHERE vec_id < 10 ORDER BY vec_id""",
    "tx_fingerprint" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT array_to_string(list_sort(list_distinct(
          string_split(text, ' '))), ' ')) AS BIGINT) AS n_distinct_canonical,
        CAST(1 AS BIGINT) AS fp_injective_ok,
        CAST(1 AS BIGINT) AS fp_consistent_ok
      FROM documents""",
    // full-probe IVF is EXACT by construction (every cell scanned once), so
    // brute-force cosine top-k is its oracle too — independent of k-means
    // centroid placement
    "sim_topk_ivf_full" -> bruteTopkSql,
    "sim_topk_sq" -> bruteTopkSql,
    // the pruned-probe shape (nlist=64, nProbe=8 — what the bench times):
    // integrity facts are deterministic (exactly k hits per query); the
    // recall flag must come out 1 for every query at the gate SF, where
    // the measured per-query floor is 2× the 0.2 bound
    "sim_topk_sq_pruned" -> """
      SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_hits,
        CAST(1 AS BIGINT) AS recall_ok
      FROM embeddings WHERE vec_id < 10 ORDER BY vec_id""",
    "tx_fingerprint_rolling" -> """
      WITH canon AS (SELECT doc_id,
        array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS c
        FROM documents)
      SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(regexp_extract_all(c, '[^\n]'),
            ch -> CAST(ascii(ch) AS BIGINT))),
          (acc, x) -> (acc*31 + x) % 1000000007) AS fingerprint
      FROM canon ORDER BY doc_id""",
    // the decode STUB is a deterministic byte fold (h = 31h + byte over the
    // UTF-8 payload, wrapping at 2^64): DuckDB replays it with HUGEINT
    // arithmetic — ascii(char) equals the payload byte because the corpus
    // is ASCII, and width/height/frames derive from unsigned residues of h
    // (floorMod over a power-of-two modulus is scheme-independent)
    "mm_features" -> s"""
      WITH f AS (SELECT
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
          CAST(strlen(text) AS BIGINT) AS byte_len, $mediaHashSql AS h
        FROM documents)
      SELECT media_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        max(64 + CAST(h % 16 AS INT)*32) AS max_width,
        max(64 + CAST((h // 256) % 9 AS INT)*32) AS max_height
      FROM f GROUP BY media_type ORDER BY media_type""",
    "mm_frames" -> s"""
      WITH f AS (SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
          $mediaHashSql AS h
        FROM documents),
      v AS (SELECT doc_id, media_type,
          CASE WHEN media_type = 'video' THEN 1 + CAST((h // 65536) % 24 AS INT)
               ELSE 1 END AS n_frames
        FROM f)
      SELECT doc_id, media_type, CAST(fi AS INT) AS frame_idx, n_frames
      FROM v, unnest(generate_series(0, n_frames - 1, 4)) AS u(fi)
      ORDER BY doc_id, frame_idx""",
    // the REAL decode round-trip: the engine encodes then byte-decodes a
    // BMP and a WAV per document; the oracle recomputes the decoded facts
    // (dimensions, pixel checksum, sample sum) from the same integer
    // generators in SQL — no codec on the DuckDB side, just arithmetic
    "mm_decode" -> """
      WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h,
                        20 + doc_id % 13 AS n, 8000 + (doc_id % 4) * 4000 AS rate
                 FROM documents),
      xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM d),
      xy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
      img AS (SELECT doc_id,
               SUM((x*7 + y*13 + doc_id) % 256
                 + 2*((x*3 + y*5 + doc_id*11) % 256)
                 + 3*((x + y + doc_id) % 256)) AS pix_sum
              FROM xy GROUP BY doc_id),
      si AS (SELECT doc_id, unnest(range(0, n)) AS i FROM d),
      wav AS (SELECT doc_id, SUM((i*31 + doc_id*17) % 65536 - 32768) AS sample_sum,
               SUM(CAST(floor(((i*31 + doc_id*17) % 65536 - 32768) / 256.0)
                   AS BIGINT) * 256) AS sum8
              FROM si GROUP BY doc_id)
      SELECT d.doc_id, CAST(d.w AS BIGINT) AS img_w, CAST(d.h AS BIGINT) AS img_h,
             CAST(img.pix_sum AS BIGINT) AS pix_sum,
             CAST(d.rate AS BIGINT) AS wav_rate, CAST(d.n AS BIGINT) AS wav_n,
             CAST(wav.sample_sum AS BIGINT) AS sample_sum,
             CAST(wav.sum8 AS BIGINT) AS sum_pcm8,
             CAST(wav.sample_sum AS BIGINT) AS sum_pcm24,
             CAST(wav.sample_sum AS BIGINT) AS sum_pcm32,
             CAST(wav.sample_sum AS BIGINT) AS sum_f32,
             CAST(wav.sample_sum AS BIGINT) AS sum_f64
      FROM d JOIN img USING (doc_id) JOIN wav USING (doc_id)
      ORDER BY doc_id""",
    // PNG round-trip: gray expands to (g,g,g) so its checksum is 6*g; RGBA
    // drops alpha so its checksum equals the RGB one — pure SQL arithmetic
    "mm_decode_png" -> """
      WITH d AS (SELECT doc_id, 5 + doc_id % 6 AS w, 4 + doc_id % 5 AS h
                 FROM documents),
      xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM d),
      xy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
      agg AS (SELECT doc_id,
               SUM((x*7 + y*13 + doc_id) % 256
                 + 2*((x*3 + y*5 + doc_id*11) % 256)
                 + 3*((x + y + doc_id) % 256)) AS rgb_sum,
               SUM(6 * ((x*11 + y*3 + doc_id*7) % 256)) AS gray_sum,
               SUM(6 * (((x*11 + y*3 + doc_id*7) % 16) * 17)) AS gray4_sum,
               SUM(168 * ((x + y + doc_id) % 4)) AS pal2_sum
              FROM xy GROUP BY doc_id)
      SELECT d.doc_id, CAST(d.w AS BIGINT) AS png_w, CAST(d.h AS BIGINT) AS png_h,
             CAST(agg.rgb_sum AS BIGINT) AS rgb_sum,
             CAST(agg.gray_sum AS BIGINT) AS gray_sum,
             CAST(agg.rgb_sum AS BIGINT) AS rgba_sum,
             CAST(agg.gray_sum AS BIGINT) AS gray16_sum,
             CAST(agg.gray4_sum AS BIGINT) AS gray4_sum,
             CAST(agg.pal2_sum AS BIGINT) AS pal2_sum
      FROM d JOIN agg USING (doc_id)
      ORDER BY doc_id""",
    // GIF round-trip: dimensions + the palette-dereferenced checksum
    // replay as pure SQL arithmetic; the interlaced decode must land every
    // row back in place, so its checksum column is the SAME expression
    "mm_decode_gif" -> """
      WITH d AS (SELECT doc_id, 6 + doc_id % 7 AS w, 4 + doc_id % 6 AS h
                 FROM documents),
      xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM d),
      xy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
      px AS (SELECT doc_id, (x + 2*y + doc_id) % 8 AS j FROM xy),
      agg AS (SELECT doc_id,
               SUM((j*31 + doc_id) % 256 + 2*((j*57 + 2*doc_id) % 256)
                 + 3*((j*89 + 3*doc_id) % 256)) AS s
              FROM px GROUP BY doc_id)
      SELECT d.doc_id, CAST(d.w AS BIGINT) AS gif_w, CAST(d.h AS BIGINT) AS gif_h,
             CAST(agg.s AS BIGINT) AS gif_sum,
             CAST(agg.s AS BIGINT) AS gif_interlaced_sum
      FROM d JOIN agg USING (doc_id)
      ORDER BY doc_id""",
    // TIFF round-trips: dimensions + checksums replay as SQL arithmetic;
    // all three compressions and the predictor variant must decode
    // identically (exact flag), gray expands to (g,g,g), palette
    // dereferences the 16-bit ColorMap (encoded v*257, high byte back)
    "mm_decode_tiff" -> """
      WITH d AS (SELECT doc_id, 7 + doc_id % 6 AS w, 5 + doc_id % 5 AS h
                 FROM documents),
      xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM d),
      xy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
      agg AS (SELECT doc_id,
          SUM((x*7 + y*13 + doc_id) % 256 + 2*((x*3 + y*5 + doc_id*11) % 256)
            + 3*((x + y + doc_id) % 256)) AS rgb_sum,
          SUM(6 * ((x*11 + y*3 + doc_id*7) % 256)) AS gray_sum,
          SUM(((x + 2*y + doc_id) % 16 * 31 + doc_id) % 256
            + 2*(((x + 2*y + doc_id) % 16 * 57 + doc_id) % 256)
            + 3*(((x + 2*y + doc_id) % 16 * 89 + doc_id) % 256)) AS pal_sum
        FROM xy GROUP BY doc_id)
      SELECT d.doc_id, CAST(d.w AS BIGINT) AS tif_w, CAST(d.h AS BIGINT) AS tif_h,
             CAST(agg.rgb_sum AS BIGINT) AS rgb_sum,
             CAST(agg.gray_sum AS BIGINT) AS gray_sum,
             CAST(agg.pal_sum AS BIGINT) AS pal_sum,
             CAST(1 AS BIGINT) AS variants_identical
      FROM d JOIN agg USING (doc_id)
      ORDER BY doc_id""",
    // lossy JPEG: exact dimensions + bounded-error flags (the flags zero
    // on violation, breaking the hash match — same pattern as the ANN and
    // SimHash bounded oracles)
    "mm_decode_jpeg" -> """
      SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS jpg_w,
             CAST(8 + doc_id % 7 AS BIGINT) AS jpg_h,
             CAST(1 AS BIGINT) AS err_max_ok,
             CAST(1 AS BIGINT) AS err_mean_ok,
             CAST(1 AS BIGINT) AS prog_identical,
             CAST(1 AS BIGINT) AS p12_err_ok,
             CAST(1 AS BIGINT) AS arith_identical
      FROM documents ORDER BY doc_id""",
  )

}
