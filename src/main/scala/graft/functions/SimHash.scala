package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{bit_count, col}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token/shingle array as a native Catalyst expression.
  *
  * For each token, take its 64-bit hash; each of the 64 bit positions votes
  * +1 (bit set) or −1 (bit clear); the SimHash has bit b set iff the vote sum
  * is positive. Near-duplicate documents land within a small Hamming distance
  * (computed downstream via `bit_count(a ^ b)`, a codegen'd built-in).
  *
  * A custom Expression (not a UDF) so the hash runs on UTF8String bytes
  * without JVM object conversion; eval-mode only (CodegenFallback) — the
  * surrounding plan stays in whole-stage codegen.
  */
case class SimHash64(child: Expression, algo: String = SimHash.AlgoXx)
    extends UnaryExpression with CodegenFallback {
  require(algo == SimHash.AlgoXx || algo == SimHash.AlgoPoly31,
    s"unknown simhash token-hash algo '$algo'")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val poly = algo == SimHash.AlgoPoly31
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = if (poly) poly31(s) else hash64(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** xxHash64-compatible hashing of the UTF8 bytes (Spark's own impl). */
  private def hash64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, StringType, 42L)

  /** Engine-portable 64-bit polynomial hash: h = h*31 + byte over the UTF-8
    * bytes, wrapping mod 2^64 (Java long overflow) — replayable by any engine
    * with 128-bit integer arithmetic (the DuckDB oracle uses HUGEINT), which
    * turns the whole SimHash pipeline into a hash-matchable computation.
    * Weaker avalanche than xxHash64, so the default stays [[hash64]]. */
  private def poly31(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Token-hash algorithms for [[SimHash64]]. */
  val AlgoXx = "xx"
  val AlgoPoly31 = "poly31"

  /** SimHash64 as a Column function. */
  def simhash64(tokens: Column, algo: String = AlgoXx): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens), algo))

  /** Hamming distance between two 64-bit hashes (codegen'd built-ins). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
