package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, FloatType, LongType => LT}

/** Random-hyperplane LSH bucket for an embedding, as a native expression.
  *
  * The hyperplane matrix is derived deterministically (no RNG) from
  * xxhash64(plane, dim) → uniform in [-1, 1); bucket bit p is the sign of
  * the projection onto plane p. One pass over the vector per row, O(planes ×
  * dims) fused multiply-adds — replaces a (planes × dims)-node interpreted
  * expression tree that dominated the ANN query's runtime.
  */
case class LshBucketExpr(child: Expression, planes: Int, dims: Int, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  // hyperplanes are a compile-time constant per operator instance; `seed`
  // derives an independent table for banded multi-table LSH
  @transient private lazy val hyper: Array[Array[Double]] =
    Array.tabulate(planes, dims) { (p, d) =>
      val h = XxHash64Function.hash(p.toLong * 1000003L + d, LT, seed)
      (Math.floorMod(h, 2000L) - 1000L) / 1000.0
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(dims, arr.numElements())
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val hp = hyper(p)
      var proj = 0.0
      var d = 0
      while (d < n) {
        if (!arr.isNullAt(d)) proj += arr.getFloat(d).toDouble * hp(d)
        d += 1
      }
      if (proj >= 0.0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucket {
  /** LSH bucket of an `array<float>` embedding. */
  def lshBucket(vec: Column, planes: Int, dims: Int, seed: Long = 42L): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(vec), planes, dims, seed))
}
