package graft.iceberg

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypesSpec extends AnyFunSuite {
  import IcebergTypes._

  private def le(n: Int, bytes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bytes == 4) bb.putInt(n) else bb.putLong(n.toLong)
    bb.array()
  }

  test("primitive type mapping") {
    assert(primitiveToSpark("int") == IntegerType)
    assert(primitiveToSpark("long") == LongType)
    assert(primitiveToSpark("string") == StringType)
    assert(primitiveToSpark("double") == DoubleType)
    assert(primitiveToSpark("date") == DateType)
    assert(primitiveToSpark("timestamp") == TimestampNTZType)
    assert(primitiveToSpark("timestamptz") == TimestampType)
    assert(primitiveToSpark("timestampz") == TimestampType) // reference spelling
    assert(primitiveToSpark("decimal(9,2)") == DecimalType(9, 2))
    assert(primitiveToSpark("fixed[16]") == BinaryType)
    assert(primitiveToSpark("time") == LongType)
  }

  test("bound decode: little-endian numerics") {
    assert(decodeBound(le(56, 4), "int") == 56L)
    assert(decodeBound(le(-7, 4), "int") == -7L)
    assert(decodeBound(le(56, 8), "long") == 56L)
    assert(decodeBound(le(17486, 4), "date") == 17486L)
    val d = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putDouble(3.5).array()
    assert(decodeBound(d, "double") == 3.5)
    val f = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putFloat(1.5f).array()
    assert(decodeBound(f, "float") == 1.5)
  }

  test("bound decode: strings utf-8") {
    assert(decodeBound("email@email.email".getBytes("UTF-8"), "string") == "email@email.email")
    assert(decodeBound("héllo".getBytes("UTF-8"), "string") == "héllo")
  }

  test("bound decode: decimal is big-endian unscaled (spec, not reference)") {
    // 14.20 as decimal(9,2): unscaled 1420 = 0x058C big-endian
    assert(decodeBound(Array(0x05.toByte, 0x8c.toByte), "decimal(9,2)") == BigDecimal("14.20"))
    // negative: -1.00 unscaled -100 = 0x9C two's complement
    assert(decodeBound(Array(0x9c.toByte), "decimal(9,2)") == BigDecimal("-1.00"))
  }

  test("literal normalization") {
    assert(normalizeLiteral(5, "int") == 5L)
    assert(normalizeLiteral(5, "double") == 5.0)
    assert(normalizeLiteral("2017-11-16", "date") == 17486L)
    assert(normalizeLiteral("2017-11-16T22:31:08", "timestamp") == 1510871468000000L)
    assert(normalizeLiteral("2017-11-16 22:31:08", "timestamp") == 1510871468000000L)
    assert(normalizeLiteral(java.sql.Date.valueOf("2017-11-16"), "date") == 17486L)
  }

  test("compare across numeric widths and incomparables") {
    assert(compare(5L, 5L).contains(0))
    assert(compare(5L, 6.0).exists(_ < 0))
    assert(compare(BigDecimal("1.5"), 1L).exists(_ > 0))
    assert(compare("a", "b").exists(_ < 0))
    assert(compare(5L, "x").isEmpty) // incomparable → pruning keeps file
    assert(compare(null, 5L).isEmpty)
  }

  test("nested types map to Spark complex types") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(
      """{"type":"struct","fields":[
        {"id":1,"name":"tags","required":false,
         "type":{"type":"list","element":"string","element-id":2}},
        {"id":3,"name":"props","required":false,
         "type":{"type":"map","key":"string","value":"long","key-id":4,"value-id":5}}
      ]}""")
    val st = toSparkType(node).asInstanceOf[StructType]
    assert(st("tags").dataType == ArrayType(StringType, containsNull = true))
    assert(st("props").dataType == MapType(StringType, LongType, valueContainsNull = true))
  }
}
