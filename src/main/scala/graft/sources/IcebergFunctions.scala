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

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array(Identifier.of(namespace, "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name == "bucket" &&
        (ident.namespace.isEmpty || ident.namespace.sameElements(Array("system"))))
      new IcebergBucketFunction
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
