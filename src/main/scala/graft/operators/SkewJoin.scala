package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for pathological key skew.
  *
  * AQE's skew-join splitting handles most skew automatically; salting is the
  * manual remedy when one key is hot enough that even split partitions
  * overwhelm an executor (the classic power-law key at 100 TB).
  *
  * The fact side gets a deterministic salt in [0, buckets) derived from a
  * high-cardinality discriminator column (NOT `rand()` — results must be
  * reproducible); the dimension side is exploded `buckets`× so every
  * (key, salt) pair finds its match. Join output is identical to the unsalted
  * join, but the hot key's rows spread over `buckets` shuffle partitions.
  */
object SkewJoin {

  /** @param fact          large skewed side
    * @param dim           smaller side, replicated `buckets`×
    * @param key           equi-join key column (same name both sides)
    * @param discriminator high-cardinality fact column used to derive a
    *                      deterministic salt
    * @param buckets       salt fan-out */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      discriminator: String, buckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(discriminator)), lit(buckets.toLong)).cast("int"))
    val exploded = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
