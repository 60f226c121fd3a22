package graft.iceberg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static evaluation kernels for Iceberg partition transforms — called both
  * from interpreted eval and from generated Java, so transform semantics
  * live in exactly one place (and provably match [[Transforms]], see
  * TransformsSpec). */
object TransformEval {

  private def bucketOf(bytes: Array[Byte], n: Int): Int =
    (Transforms.Murmur3.hash(bytes) & Int.MaxValue) % n

  /** Iceberg spec: integral values hash their 8-byte little-endian form. */
  def bucketLong(v: Long, n: Int): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    bucketOf(b, n)
  }

  def bucketString(s: UTF8String, n: Int): Int = bucketOf(s.getBytes, n)

  def bucketBytes(b: Array[Byte], n: Int): Int = bucketOf(b, n)

  /** Decimal buckets hash the minimal two's-complement unscaled value. */
  def bucketDecimal(d: Decimal, n: Int): Int =
    bucketOf(d.toJavaBigDecimal.unscaledValue.toByteArray, n)

  // time transforms take epoch-MICROS and return the Iceberg int value
  def year(micros: Long): Int =
    java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, 86400000000L)).getYear - 1970
  def month(micros: Long): Int = {
    val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, 86400000000L))
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }
  def day(micros: Long): Int = Math.floorDiv(micros, 86400000000L).toInt
  def hour(micros: Long): Int = Math.floorDiv(micros, 3600000000L).toInt
}

/** `bucket[N]` as a native Catalyst expression (murmur3_x86_32 over the
  * spec serialized form) — replaces the round-1 write-path Scala UDF so the
  * write projection stays inside whole-stage codegen with no SerDe.
  * Accepts long/int, string, binary, and decimal children. */
case class IcebergBucketExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  private lazy val method: String = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | DateType => "bucketLong"
    case TimestampType | TimestampNTZType => "bucketLong"
    case StringType => "bucketString"
    case BinaryType => "bucketBytes"
    case _: DecimalType => "bucketDecimal"
    case other => throw new IllegalArgumentException(s"bucket on $other unsupported")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case l: Long => TransformEval.bucketLong(l, n)
    case i: Integer => TransformEval.bucketLong(i.longValue(), n)
    case s: UTF8String => TransformEval.bucketString(s, n)
    case b: Array[Byte] => TransformEval.bucketBytes(b, n)
    case d: Decimal => TransformEval.bucketDecimal(d, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = method // force resolution (throws on unsupported types at plan time)
    nullSafeCodeGen(ctx, ev, c => {
      val in = if (m == "bucketLong") s"(long)($c)" else c
      s"${ev.value} = graft.iceberg.TransformEval.$m($in, $n);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}

/** year/month/day/hour over epoch-micros as a native Catalyst expression
  * (write-path counterpart of [[Transforms.TimeTransform]]). */
case class IcebergTimeExpr(child: Expression, transformName: String)
    extends UnaryExpression {

  require(Set("year", "month", "day", "hour").contains(transformName),
    s"unknown time transform $transformName")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val micros = input.asInstanceOf[Long]
    transformName match {
      case "year" => TransformEval.year(micros)
      case "month" => TransformEval.month(micros)
      case "day" => TransformEval.day(micros)
      case "hour" => TransformEval.hour(micros)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.iceberg.TransformEval.$transformName($c);")

  override protected def withNewChildInternal(newChild: Expression): IcebergTimeExpr =
    copy(child = newChild)
}

object TransformExpr {
  def bucket(c: Column, n: Int): Column =
    ColumnBridge.column(IcebergBucketExpr(ColumnBridge.expression(c), n))
  def time(c: Column, name: String): Column =
    ColumnBridge.column(IcebergTimeExpr(ColumnBridge.expression(c), name))
}
