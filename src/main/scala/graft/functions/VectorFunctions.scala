package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector math over `array<float>` columns using codegen'd
  * built-ins (`transform`/`zip_with`/`aggregate`) — no UDFs, no linalg
  * dependency, safe at any scale.
  *
  * All arithmetic is done in double with a left-to-right fold so results are
  * bit-deterministic and reproducible by the DuckDB oracle (same IEEE ops in
  * the same order).
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Left-fold sum of a double array (deterministic order). */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x * y))

  def norm2(a: Column): Column = sqrt(fsum(transform(a, x => x * x)))

  /** Cosine similarity = dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (norm2(ad) * norm2(bd))
  }

  /** Random-hyperplane LSH bucket for an embedding: `planes` pseudo-random
    * hyperplanes derived deterministically from a hash (no RNG); the bucket
    * is the sign-bit string packed into a long. Vectors in the same bucket
    * are likely cosine-near; used to restrict ANN search to a bucket instead
    * of a full cross join (the 100 TB path). Backed by a one-pass custom
    * expression ([[LshBucketExpr]]). */
  def lshBucket(v: Column, planes: Int, dims: Int, seed: Long = 42L): Column =
    LshBucket.lshBucket(v, planes, dims, seed)

  /** Squared L2 distance (codegen'd zip_with fold — no UDF). */
  def l2Squared(a: Column, b: Column): Column =
    fsum(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)))

  /** Per-vector symmetric int8 scalar quantization (the FAISS SQ8 shape):
    * `q[i] = round(v[i] · 127 / max|v|)` ∈ [−127, 127]. A vector's codes
    * are 1/4 the bytes of its floats, and cosine is SCALE-INVARIANT, so
    * ranking on the codes needs no dequantization — the per-vector scale
    * cancels out of `cos(q_a, q_b)`. A zero vector quantizes to zeros
    * (its cosine is undefined either way). Deterministic round-half-up in
    * double, so an external engine replays the exact codes. */
  def quantizeInt8(v: Column): Column = {
    val vd = toDouble(v)
    val maxAbs = array_max(transform(vd, x => abs(x)))
    transform(vd, x =>
      when(maxAbs > 0, round(x * lit(127.0) / maxAbs))
        .otherwise(lit(0.0)).cast(IntegerType))
  }
}
