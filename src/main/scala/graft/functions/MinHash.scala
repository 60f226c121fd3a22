package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass MinHash signature as a native Catalyst expression.
  *
  * The naive formulation (k × `array_min(transform(shingles, xxhash64(i, s)))`)
  * walks the shingle array k times through interpreted higher-order lambdas —
  * measured 400+ s for 5 000 docs at k=64. This expression hashes each shingle
  * ONCE (xxhash64 over its UTF8 bytes) and derives the k per-permutation
  * hashes with Kirsch–Mitzenmacher double hashing
  * (`h_i = h1 + i·h2`, odd-constant mixed), keeping the per-row cost at
  * O(|shingles| · k) cheap integer ops with zero allocations per element.
  *
  * Signature quality is equivalent for LSH banding purposes (standard result
  * for double hashing in MinHash/Bloom constructions).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        val h2 = XxHash64Function.hash(s, StringType, 0x9747b28cL) | 1L
        var j = 0
        var h = h1
        while (j < k) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHash {
  /** k-wide MinHash signature of a shingle array (one pass, codegen-adjacent). */
  def minhash(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), k))
}
