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

  test("v3 read tolerance: unknown + nanosecond timestamps; hard types still refuse") {
    // `unknown` is the v3 always-null placeholder — reads as NullType
    assert(primitiveToSpark("unknown") == NullType)
    // ns timestamps exceed Spark's µs range: surface raw int64 nanos
    assert(primitiveToSpark("timestamp_ns") == LongType)
    assert(primitiveToSpark("timestamptz_ns") == LongType)
    val ns = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(1510871468123456789L).array()
    assert(decodeBound(ns, "timestamp_ns") == 1510871468123456789L)
    assert(decodeBound(ns, "timestamptz_ns") == 1510871468123456789L)
    // ns WRITES (round 14): encodeBound round-trips the raw int64 nanos
    assert(decodeBound(encodeBound(1510871468123456789L, "timestamp_ns"),
      "timestamp_ns") == 1510871468123456789L)
    assert(decodeBound(encodeBound(-7L, "timestamptz_ns"),
      "timestamptz_ns") == -7L)
    // genuinely unsupported types keep refusing loudly, not misreading
    intercept[IllegalArgumentException](primitiveToSpark("geometry"))
    intercept[IllegalArgumentException](encodeBound(1L, "unknown"))
  }

  test("v3 metadata tolerance: multi-arg transforms parse, v4 is refused") {
    val meta = TableMetadata.parse(
      """{"format-version":3,"location":"/tmp/x","last-updated-ms":0,
         "current-schema-id":0,
         "schemas":[{"schema-id":0,"fields":[
           {"id":1,"name":"a","required":false,"type":"string"},
           {"id":2,"name":"b","required":false,"type":"long"},
           {"id":3,"name":"u","required":false,"type":"unknown"},
           {"id":4,"name":"t","required":false,"type":"timestamp_ns"}]}],
         "default-spec-id":0,
         "partition-specs":[{"spec-id":0,"fields":[
           {"source-ids":[1,2],"field-id":1000,"name":"z","transform":"zorder"},
           {"source-ids":[2],"field-id":1001,"name":"b1","transform":"identity"},
           {"source-id":1,"field-id":1002,"name":"a1","transform":"identity"}]}],
         "current-snapshot-id":-1,"snapshots":[],"properties":{},
         "next-row-id":0}""")
    val pf = meta.partitionSpecs.head.fields
    // multi-source: no single schema field matches -> pruning/writes skip it
    assert(pf(0).sourceId == -1 && pf(0).sourceIds == Seq(1, 2))
    // single-element source-ids degrades to that source
    assert(pf(1).sourceId == 2 && pf(1).sourceIds == Seq(2))
    assert(pf(2).sourceId == 1 && pf(2).sourceIds.isEmpty)
    // unknown transform names parse read-tolerantly, never evaluate
    assert(Transforms.parseOption("zorder").isEmpty)
    assert(Transforms.parseOption("bucket[4]").isDefined)
    // the schema with v3 types converts
    val st = meta.schemas.head.toSpark
    assert(st("u").dataType == NullType && st("t").dataType == LongType)
    // a format version past this reader REFUSES instead of misreading
    val v4 = intercept[IllegalArgumentException](TableMetadata.parse(
      """{"format-version":4,"location":"/tmp/x"}"""))
    assert(v4.getMessage.contains("format-version 4"))
  }
}
