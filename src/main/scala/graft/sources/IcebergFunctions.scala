package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.iceberg.TransformEval

/** [[FunctionCatalog]] serving Iceberg's partition-transform functions —
  * mixed into every graft catalog so Catalyst can resolve the
  * `bucket(N, col)` transform reported by key-grouped scans (the hook that
  * makes storage-partitioned joins work) and SQL can call
  * `SELECT cat.bucket(16, id)` directly. Resolved under the empty/system
  * namespace, where Catalyst looks for transform functions. */
trait IcebergTransformFunctions extends FunctionCatalog {

  private val names =
    Seq("bucket", "truncate", "years", "months", "days", "hours")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      names.map(Identifier.of(namespace, _)).toArray
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.isEmpty || ident.namespace.sameElements(Array("system")))
      ident.name match {
        case "bucket" => new IcebergBucketFunction
        case "truncate" => new IcebergTruncateFunction
        case n @ ("years" | "months" | "days" | "hours") =>
          new IcebergTimeTransformFunction(n)
        case _ => throw new NoSuchFunctionException(ident)
      }
    else throw new NoSuchFunctionException(ident)
}

/** The Iceberg `bucket` transform as a Spark V2 catalog function.
  *
  * Serving this from the catalog's `FunctionCatalog` is what lets Catalyst
  * resolve the `bucket(N, col)` transform that [[GraftIcebergScan]] reports
  * in its `KeyGroupedPartitioning` — the prerequisite for storage-partitioned
  * joins: two tables bucketed the same way join with NO shuffle, because both
  * sides resolve to the same function (`canonicalName` + bucket count match).
  *
  * Also directly callable from SQL: `SELECT cat.bucket(16, id)`.
  */
class IcebergBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets int, col); got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      "bucket's first argument (numBuckets) must be int")
    val col = inputType.fields(1).dataType
    col match {
      case IntegerType | LongType | DateType | TimestampType | StringType |
           BinaryType | _: DecimalType => IcebergBucketBound(col)
      case other =>
        throw new UnsupportedOperationException(s"bucket over $other is not supported")
    }
  }

  override def description(): String =
    "bucket(numBuckets, col): Iceberg murmur3 bucket transform (spec Appendix B)"
}

/** Bound murmur3 bucket — same kernels as the write path and the metadata
  * plane ([[graft.iceberg.TransformEval]]), so partition values, pruning,
  * and join partitioning provably agree. */
final case class IcebergBucketBound(colType: DataType) extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, colType)

  override def resultType(): DataType = IntegerType

  override def name(): String = "bucket"

  // both join sides must resolve to a function Spark considers THE SAME;
  // equality is canonicalName + the numBuckets literal
  override def canonicalName(): String = s"graft.bucket(${colType.catalogString})"

  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    colType match {
      case IntegerType => TransformEval.bucketLong(input.getInt(1).toLong, n)
      case DateType => TransformEval.bucketLong(input.getInt(1).toLong, n)
      case LongType | TimestampType => TransformEval.bucketLong(input.getLong(1), n)
      case StringType => TransformEval.bucketString(input.getUTF8String(1), n)
      case BinaryType => TransformEval.bucketBytes(input.getBinary(1), n)
      case d: DecimalType =>
        TransformEval.bucketDecimal(input.getDecimal(1, d.precision, d.scale), n)
      case other => throw new UnsupportedOperationException(s"bucket over $other")
    }
  }
}

/** Iceberg `truncate[W]` as a V2 catalog function —
  * `SELECT cat.truncate(10, col)`: ints/longs floor to the width multiple,
  * strings/binary keep the first W units, decimals floor their unscaled
  * value (spec "Truncate transform details"). Same semantics as the
  * metadata plane's [[graft.iceberg.Transforms]], so SQL-side grouping by
  * the transform agrees with partition tuples byte-for-byte. */
class IcebergTruncateFunction extends UnboundFunction {

  override def name(): String = "truncate"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"truncate takes (width int, col); got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      "truncate's first argument (width) must be int")
    val col = inputType.fields(1).dataType
    col match {
      case IntegerType | LongType | StringType | BinaryType | _: DecimalType =>
        IcebergTruncateBound(col)
      case other =>
        throw new UnsupportedOperationException(s"truncate over $other is not supported")
    }
  }

  override def description(): String =
    "truncate(width, col): Iceberg truncate transform (spec Appendix B)"
}

final case class IcebergTruncateBound(colType: DataType)
  extends ScalarFunction[Any] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
  override def resultType(): DataType = colType
  override def name(): String = "truncate"
  override def canonicalName(): String = s"graft.truncate(${colType.catalogString})"
  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow): Any = {
    if (input.isNullAt(1)) return null
    val w = input.getInt(0)
    require(w > 0, s"truncate width must be positive, got $w")
    colType match {
      case IntegerType =>
        val v = input.getInt(1); v - java.lang.Math.floorMod(v, w)
      case LongType =>
        val v = input.getLong(1); v - java.lang.Math.floorMod(v, w.toLong)
      case StringType =>
        val s = input.getUTF8String(1)
        if (s.numChars <= w) s else s.substring(0, w)
      case BinaryType =>
        val b = input.getBinary(1)
        if (b.length <= w) b else java.util.Arrays.copyOf(b, w)
      case d: DecimalType =>
        val dec = input.getDecimal(1, d.precision, d.scale)
        val unscaled = dec.toJavaBigDecimal.unscaledValue()
        val ww = java.math.BigInteger.valueOf(w.toLong)
        val truncated = unscaled.subtract(unscaled.mod(ww)) // mod is floored
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(truncated, d.scale), d.precision, d.scale)
      case other => throw new UnsupportedOperationException(s"truncate over $other")
    }
  }
}

/** Iceberg time transforms (`years`/`months`/`days`/`hours`) as V2 catalog
  * functions over timestamp/timestamp_ntz/date columns. Result types match
  * Iceberg's Spark functions: `days` yields DATE (days since epoch render
  * as a date), the others INT offsets from 1970 — so SQL GROUP BYs line up
  * with hidden-partition tuples and key-grouped join partitioning. */
class IcebergTimeTransformFunction(fn: String) extends UnboundFunction {

  override def name(): String = fn

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$fn takes one timestamp/date column; got ${inputType.catalogString}")
    val col = inputType.fields(0).dataType
    col match {
      case TimestampType | TimestampNTZType | DateType =>
        require(!(fn == "hours" && col == DateType),
          "hours over a date has no meaning (dates carry no time of day)")
        IcebergTimeTransformBound(fn, col)
      case other =>
        throw new UnsupportedOperationException(s"$fn over $other is not supported")
    }
  }

  override def description(): String =
    s"$fn(col): Iceberg $fn partition transform (spec Appendix B)"
}

final case class IcebergTimeTransformBound(fn: String, colType: DataType)
  extends ScalarFunction[Any] {

  override def inputTypes(): Array[DataType] = Array(colType)
  override def resultType(): DataType =
    if (fn == "days") DateType else IntegerType
  override def name(): String = fn
  override def canonicalName(): String = s"graft.$fn(${colType.catalogString})"
  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow): Any = {
    if (input.isNullAt(0)) return null
    val micros: Long = colType match {
      case DateType => input.getInt(0).toLong * 86400000000L
      case _ => input.getLong(0)
    }
    fn match {
      case "years" => TransformEval.year(micros)
      case "months" => TransformEval.month(micros)
      case "days" => TransformEval.day(micros)
      case "hours" => TransformEval.hour(micros)
    }
  }
}
