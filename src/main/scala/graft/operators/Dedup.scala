package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{SimHash, TextFunctions => TF}

/** Deduplication operators for LLM training-data pipelines.
  *
  * Every operator is a pure DataFrame→DataFrame transform: no driver-side
  * collection, shuffle keys chosen so the candidate-generation stage is the
  * only O(n·b) shuffle and verification touches candidate pairs only — the
  * standard shingle→MinHash→band→bucket-join shape that scales to 100 TB.
  */
object Dedup {

  /** Exact dedup bookkeeping: every row annotated with its content-group
    * size and whether it is the canonical (minimum-id) copy. Filtering
    * `is_canonical` yields the deduplicated corpus; a plain groupBy-count
    * underneath (map-side partial agg, one shuffle on the text hash). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol))
    df.withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
      .select(col(idCol), col("n_copies"), col("canonical_id"), col("is_canonical"))
  }

  /** Exact Jaccard near-duplicate pairs over word n-gram shingles — the
    * ground-truth quadratic version (use for verification / small inputs;
    * the scalable path is [[minhashDedup]]). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"), TF.wordShingles(col(textCol), n).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard", TF.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash + LSH near-duplicate detection:
    * shingle → k-wide MinHash signature → `bands` band-hashes → explode →
    * self-join on (band, bucket) → distinct candidate pairs → verify with
    * exact Jaccard on the shingle arrays.
    *
    * Only candidates sharing an LSH bucket are verified, so the shuffle
    * volume is O(rows × bands) and verification is O(candidates) — no
    * quadratic stage. Output equals [[ngramJaccardPairs]] up to LSH recall
    * (≥ 0.999 for J ≥ 0.8 with k=64, bands=16). */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"), TF.wordShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", graft.functions.MinHash.minhash(col("sh"), k))
      .withColumn("bands", TF.lshBands(col("sig"), k, bands))
    val buckets = sig.select(col("id"), explode(col("bands")).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand.join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", TF.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 64-bit SimHash over shingles, candidates
    * from banding the hash into 4 16-bit blocks (near-dups share at least one
    * block when Hamming distance ≤ 3 by pigeonhole... up to 4·16 exactness),
    * verified by exact Hamming distance. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, maxHamming: Int = 8): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        SimHash.simhash64(TF.wordShingles(col(textCol), n)).as("h"))
    // band the 64-bit hash into 4 16-bit blocks for candidate generation
    val blocks = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("h"), b * 16).bitwiseAND(lit(0xffffL)).as("bucket")))
    val banded = sh.withColumn("bb", explode(array(blocks: _*)))
      .select(col("id"), col("h"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        SimHash.hamming(col("x.h"), col("y.h")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold within LSH buckets
    * (random-hyperplane). The bucket join bounds the pair count; exact cosine
    * verifies. For guaranteed-exact small inputs use a plain cross join. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, planes: Int = 8, dims: Int = 64): DataFrame = {
    import graft.functions.VectorFunctions._
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dims))
    v.as("x").join(v.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cos", cosine(col("x.v"), col("y.v")))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("cos"))
  }
}
