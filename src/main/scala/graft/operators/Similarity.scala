package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast —
  * one pass over the corpus, no shuffle of the corpus itself, rank via a
  * per-query window. Scale path: restrict candidates to matching (or
  * neighboring) random-hyperplane LSH buckets before ranking.
  */
object Similarity {

  /** Broadcast-or-shuffle decision for an ANN probe side. A top-k SERVING
    * batch (the common case) is small, and broadcasting it scans the corpus
    * with zero shuffle; but a corpus-sized query set — the
    * join-everyone-to-everyone workload — must never be FORCED into every
    * executor's memory: beyond `limitBytes` (plan statistics; no extra job)
    * the hint drops and Catalyst/AQE plan a shuffle join keyed on the
    * bucket/cell, free to re-broadcast at runtime if the actual size turns
    * out small. */
  private def probeSide(df: DataFrame, limitBytes: Long): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= limitBytes)
      broadcast(df)
    else df

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** LSH-bucketed ANN: rank only candidates that share a hyperplane bucket
    * with the query (plus all-but-one-bit neighbor buckets for recall).
    * Cuts the scored pairs from |corpus|·|queries| to bucket-local sizes.
    * `planes <= 0` auto-sizes the bucket count to the corpus (~`targetBucket`
    * vectors per bucket) so per-bucket candidate lists stay bounded as the
    * corpus grows — the fixed-64-bucket shape does not survive 100×. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      planes: Int = -1, dims: Int = 64, targetBucket: Long = 64L,
      corpusSize: Long = -1L,
      /** Probe-side broadcast ceiling (see [[probeSide]]). */
      broadcastProbeBytes: Long = 64L << 20): DataFrame = {
    val p = if (planes > 0) planes
      else graft.operators.Dedup.autoPlanes(
        if (corpusSize >= 0) corpusSize
        else graft.operators.Dedup.rowCountFor(corpus), targetBucket)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), p, dims))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qbucket", lshBucket(col("qv"), p, dims))
    // multi-probe: query bucket itself + each single-bit flip (planes probes)
    val probes = array((lit(0L) +: (0 until p).map(pp => shiftleft(lit(1L), pp))): _*)
    val q = q0.withColumn("probe", explode(probes))
      .withColumn("bucket", col("qbucket").bitwiseXOR(col("probe")))
    val scored = c.join(probeSide(q, broadcastProbeBytes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** An IVF (inverted-file) coarse-quantizer index: every corpus vector
    * assigned to its nearest k-means centroid. Build once, search many — at
    * scale the assignment is a table you persist (e.g. an Iceberg table
    * partitioned by `cell`), so a probe reads only nProbe/nlist of the
    * corpus. */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame, nlist: Int,
      /** Pre-materialized SQ8 code table (`neighbor_id`, `cell`, `cq`) — at
        * scale the int8 codes are PART of the index (their own table), so
        * the candidate scan never touches the float vectors. When absent,
        * [[ivfSqTopK]] quantizes inline from `assigned` (the build-per-call
        * contract-query shape). Produce one with [[sq8Codes]]. */
      codes: Option[DataFrame] = None)

  /** The SQ8 code table of an index — what a production deployment would
    * materialize alongside the assignment (1/4 the bytes of the floats). */
  def sq8Codes(index: IvfIndex): DataFrame =
    index.assigned.select(col("neighbor_id"), col("cell"),
      quantizeInt8(col("cv")).as("cq"))

  /** Train the coarse quantizer (k-means on a corpus sample) and assign
    * every vector to a cell. The FAISS IVF-Flat shape on DataFrames.
    *
    * `trainFraction < 0` (the default) auto-sizes the training sample to
    * ~`trainPointsPerCell × nlist` vectors using plan statistics (the same
    * `rowCountFor` shape as the LSH auto-sizing) — FAISS trains its coarse
    * quantizer on ~256 points per centroid; training k-means on a 100 TB
    * corpus would be the footgun. Pass 1.0 to force full-corpus training. */
  def buildIvfIndex(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 64, trainFraction: Double = -1.0, seed: Long = 42L,
      trainPointsPerCell: Long = 256L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("feat", array_to_vector(col("cv")))
    val fraction =
      if (trainFraction >= 0) trainFraction
      else {
        val n = graft.operators.Dedup.rowCountFor(corpus)
        if (n <= 0) 1.0
        else math.min(1.0, trainPointsPerCell.toDouble * nlist / n)
      }
    val train = if (fraction >= 1.0) feats else feats.sample(fraction, seed)
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("feat").setPredictionCol("cell").fit(train)
    val assigned = model.transform(feats).select(
      col("neighbor_id"), col("cv"), col("cell"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }.toSeq
      .toDF("cell", "centroid")
    IvfIndex(assigned, centroids, nlist)
  }

  /** IVF-SQ8 with exact re-rank (the FAISS `IVF,SQ8` + refine shape): the
    * probed cells are ranked on int8 scalar-quantized codes — cosine is
    * scale-invariant, so the codes rank WITHOUT dequantization — and only
    * the top `k · rerankFactor` candidates per query fetch their
    * full-precision vectors (an id equi-join) for the exact final cosine.
    *
    * This is the 100 TB memory-bandwidth path: the candidate scan reads
    * 1/4 the bytes (int8 codes instead of floats; at scale the codes live
    * in their own column/table so the float vectors are never scanned),
    * and full vectors move only for O(k · rerankFactor · |queries|) rows.
    * With `nProbe = nlist` and an adequate re-rank margin the result is
    * EXACT (the contract query pins it to the brute-force oracle); lower
    * nProbe trades recall for probe cost exactly as in [[ivfTopK]]. */
  def ivfSqTopK(index: IvfIndex, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int = 8,
      rerankFactor: Int = 4,
      broadcastProbeBytes: Long = 64L << 20): DataFrame = {
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    val codes = index.codes.getOrElse(sq8Codes(index))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("cell"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("d2", l2Squared(col("qv"), col("centroid")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), quantizeInt8(col("qv")).as("qq"),
        col("cell"))
    // stage 1: rank candidates on the codes alone (no float vectors read)
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    val cands = codes.join(probeSide(probes, broadcastProbeBytes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos", cosine(col("qq"), col("cq")))
      .withColumn("cand_rank", row_number().over(cw))
      .filter(col("cand_rank") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"), col("qv"))
    // stage 2: exact cosine over full vectors, candidates only
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.join(index.assigned.select(col("neighbor_id"), col("cv")),
        Seq("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** ANN top-k through an IVF index: each query ranks only the vectors in
    * its `nProbe` nearest cells (euclidean to centroid — the k-means
    * metric), final ranking by exact cosine. Scored pairs drop from
    * |corpus|·|queries| to ~nProbe/nlist of that; the probe side broadcasts
    * only while it is provably small (see [[probeSide]]). */
  def ivfTopK(index: IvfIndex, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int = 8,
      /** Probe-side broadcast ceiling (see [[probeSide]]). */
      broadcastProbeBytes: Long = 64L << 20): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // nearest nProbe cells per query: cross join against the (tiny) centroid
    // table, codegen'd distance, window rank — no UDF in the query path
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("cell"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("d2", l2Squared(col("qv"), col("centroid")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = index.assigned.join(probeSide(probes, broadcastProbeBytes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
