package graft.iceberg

import org.scalatest.funsuite.AnyFunSuite

/** Transform conformance vectors from the public Iceberg spec (Appendix B). */
class TransformsSpec extends AnyFunSuite {
  import Transforms._

  test("murmur3 bucket hash matches Iceberg spec vectors") {
    // spec: hashInt(34) = hashLong(34) = 2017239379
    def bucketHash(v: Any, t: String): Int =
      Bucket(Int.MaxValue)(v, t).get.asInstanceOf[Long].toInt // N huge → identity on hash%N
    val b = Bucket(1)
    // exercise the raw hash through a bucket big enough not to wrap small values
    val h34int = Bucket(Int.MaxValue)(34L, "int").get
    val h34long = Bucket(Int.MaxValue)(34L, "long").get
    assert(h34int == h34long) // int and long hash identically per spec
    assert((Murmur3.hash(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(34L).array()) & Int.MaxValue) ==
      (2017239379 & Int.MaxValue))
    // string "iceberg" → 1210000089
    assert(Murmur3.hash("iceberg".getBytes("UTF-8")) == 1210000089)
    // date 2017-11-16 = epoch day 17486 → hashes as long → -653330422
    assert(Murmur3.hash(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(17486L).array()) == -653330422)
  }

  test("bucket distributes into [0, N)") {
    val b = Bucket(16)
    val vals = (0L until 1000L).map(i => b(i, "long").get.asInstanceOf[Long])
    assert(vals.forall(v => v >= 0 && v < 16))
    assert(vals.distinct.size == 16)
  }

  test("truncate on ints uses floor semantics (negatives)") {
    val t = Truncate(10)
    assert(t(37L, "int").get == 30L)
    assert(t(-3L, "int").get == -10L) // NOT -0: spec floor semantics
    assert(t(0L, "int").get == 0L)
  }

  test("truncate on strings is codepoint prefix") {
    val t = Truncate(3)
    assert(t("iceberg", "string").get == "ice")
    assert(t("ab", "string").get == "ab")
  }

  test("truncate on decimal") {
    val t = Truncate(50) // unscaled truncation, spec example: 10.65 → 10.50 with W=50
    assert(t(BigDecimal("10.65"), "decimal(9,2)").get == BigDecimal("10.50"))
  }

  test("day/month/year/hour transforms") {
    // 2017-11-16T22:31:08 UTC = 1510871468 s → µs
    val micros = 1510871468000000L
    assert(Day(micros, "timestamp").get == 17486L)
    assert(Year(micros, "timestamp").get == 47L)   // 2017 - 1970
    assert(Month(micros, "timestamp").get == 574L) // 47*12 + 10
    assert(Hour(micros, "timestamp").get == 419686L)
    // date source: epoch days pass through day
    assert(Day(17486L, "date").get == 17486L)
    // pre-epoch floor semantics
    assert(Day(-1L, "timestamp").get == -1L)
  }

  test("void maps everything to null") {
    assert(Void(42L, "long").get == null)
    assert(Void("x", "string").get == null)
  }

  test("parse round-trips names") {
    assert(parse("bucket[16]") == Bucket(16))
    assert(parse("truncate[4]") == Truncate(4))
    assert(parse("identity") == Identity)
    assert(parse("day") == Day)
    assert(parse("void") == Void)
  }
}
