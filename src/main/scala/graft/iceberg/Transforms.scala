package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Iceberg partition transforms (hidden partitioning).
  *
  * Mirrors the reference's `conversions.py:61-86` transform() but conforms to
  * the Iceberg spec where the reference diverges:
  *  - `bucket[N]` hashes the value's *serialized* little-endian form with
  *    murmur3_x86_32 (the reference hashes only raw str/bytes via mmh3,
  *    `conversions.py:69`, which is only correct for strings).
  *  - adds `year`/`month`/`hour` (reference implements only `day`,
  *    `conversions.py:78-82`).
  *
  * All functions operate on the normalized comparable domain of
  * [[IcebergTypes.decodeBound]] (Long for int/long/date/time/timestamp,
  * Double, String, BigDecimal, Array[Byte]).
  */
object Transforms {

  sealed trait Transform {
    def name: String
    /** Result iceberg type given the source iceberg type (conversions.py:49-58). */
    def resultType(sourceType: String): String
    /** Apply to a normalized value; None = transform cannot be applied. */
    def apply(value: Any, sourceType: String): Option[Any]
    /** True if order-preserving — range predicates may be rewritten through it. */
    def preservesOrder: Boolean
    /** True when the transform loses no information for the given source type
      * (bijective on its domain): strict range comparisons stay valid. */
    def lossless(sourceType: String): Boolean = false
  }

  case object Identity extends Transform {
    val name = "identity"
    def resultType(s: String): String = s
    def apply(v: Any, s: String): Option[Any] = Some(v)
    val preservesOrder = true
    override def lossless(sourceType: String): Boolean = true
  }

  final case class Bucket(n: Int) extends Transform {
    val name = s"bucket[$n]"
    def resultType(s: String): String = "int"
    val preservesOrder = false
    def apply(v: Any, sourceType: String): Option[Any] =
      hashBytes(v, sourceType).map(b => ((Murmur3.hash(b) & Int.MaxValue) % n).toLong)

    /** Spec serialization for bucket hashing: int/long/date/time/timestamp →
      * 8-byte little-endian long; string → UTF-8; decimal → minimal big-endian
      * two's complement of the unscaled value; binary/fixed/uuid → raw bytes. */
    private def hashBytes(v: Any, sourceType: String): Option[Array[Byte]] = v match {
      case l: Long =>
        Some(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array())
      case s: String => Some(s.getBytes(StandardCharsets.UTF_8))
      case b: Array[Byte] => Some(b)
      case d: BigDecimal => Some(d.underlying.unscaledValue.toByteArray)
      case _ => None // float/double/boolean are not bucketable per spec
    }
  }

  final case class Truncate(w: Int) extends Transform {
    val name = s"truncate[$w]"
    def resultType(s: String): String = s
    val preservesOrder = true
    def apply(v: Any, sourceType: String): Option[Any] = v match {
      case l: Long => Some(l - (((l % w) + w) % w)) // floor semantics for negatives
      case s: String => Some(if (s.length <= w) s else s.substring(0, s.offsetByCodePoints(0, w)))
      case b: Array[Byte] => Some(b.take(w))
      case d: BigDecimal =>
        val unscaled = d.underlying.unscaledValue
        val wBig = java.math.BigInteger.valueOf(w)
        val rem = unscaled.mod(wBig) // mod is always non-negative
        Some(BigDecimal(new java.math.BigDecimal(unscaled.subtract(rem), d.scale)))
      case _ => None
    }
  }

  sealed abstract class TimeTransform(val name: String) extends Transform {
    def resultType(s: String): String = "int"
    val preservesOrder = true
    /** value is epoch-days (date) or epoch-micros (timestamp). */
    def apply(v: Any, sourceType: String): Option[Any] = v match {
      case l: Long =>
        val days = sourceType match {
          case "date" => l
          case "timestamp" | "timestamptz" | "timestampz" =>
            Math.floorDiv(l, 86400000000L)
          case _ => return None
        }
        Some(fromEpochDay(days, sourceType, l))
      case _ => None
    }
    protected def fromEpochDay(days: Long, sourceType: String, raw: Long): Long
  }

  case object Year extends TimeTransform("year") {
    protected def fromEpochDay(days: Long, st: String, raw: Long): Long =
      java.time.LocalDate.ofEpochDay(days).getYear.toLong - 1970L
  }
  case object Month extends TimeTransform("month") {
    protected def fromEpochDay(days: Long, st: String, raw: Long): Long = {
      val d = java.time.LocalDate.ofEpochDay(days)
      (d.getYear - 1970L) * 12L + (d.getMonthValue - 1)
    }
  }
  case object Day extends TimeTransform("day") {
    protected def fromEpochDay(days: Long, st: String, raw: Long): Long = days
    // a date column has day granularity already: day() is the identity on it
    override def lossless(sourceType: String): Boolean = sourceType == "date"
  }
  case object Hour extends TimeTransform("hour") {
    protected def fromEpochDay(days: Long, st: String, raw: Long): Long =
      Math.floorDiv(raw, 3600000000L) // only defined on timestamps
  }

  case object Void extends Transform {
    val name = "void"
    def resultType(s: String): String = s
    def apply(v: Any, s: String): Option[Any] = Some(null)
    val preservesOrder = false
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  def parse(name: String): Transform = name match {
    case "identity" => Identity
    case BucketRe(n) => Bucket(n.toInt)
    case TruncateRe(w) => Truncate(w.toInt)
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case "void" => Void
    case other => throw new IllegalArgumentException(s"unknown transform: $other")
  }

  /** Read-tolerant parse: None for transform names this engine cannot
    * evaluate (e.g. a v3 multi-argument transform). Pruning then keeps the
    * file — sound — instead of failing the whole scan; WRITE paths keep
    * using [[parse]] so they refuse loudly. */
  def parseOption(name: String): Option[Transform] =
    scala.util.Try(parse(name)).toOption

  /** Murmur3_x86_32, seed 0 — the hash the Iceberg spec mandates for bucket
    * transforms. Implemented from the public algorithm description. */
  object Murmur3 {
    def hash(data: Array[Byte], seed: Int = 0): Int = {
      val c1 = 0xcc9e2d51
      val c2 = 0x1b873593
      var h1 = seed
      val nblocks = data.length / 4
      var i = 0
      while (i < nblocks) {
        val base = i * 4
        var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
          ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
        k1 *= c1
        k1 = Integer.rotateLeft(k1, 15)
        k1 *= c2
        h1 ^= k1
        h1 = Integer.rotateLeft(h1, 13)
        h1 = h1 * 5 + 0xe6546b64
        i += 1
      }
      var k1 = 0
      val tail = nblocks * 4
      (data.length & 3) match {
        case 3 =>
          k1 ^= (data(tail + 2) & 0xff) << 16
          k1 ^= (data(tail + 1) & 0xff) << 8
          k1 ^= data(tail) & 0xff
        case 2 =>
          k1 ^= (data(tail + 1) & 0xff) << 8
          k1 ^= data(tail) & 0xff
        case 1 =>
          k1 ^= data(tail) & 0xff
        case _ =>
      }
      if ((data.length & 3) != 0) {
        k1 *= c1
        k1 = Integer.rotateLeft(k1, 15)
        k1 *= c2
        h1 ^= k1
      }
      h1 ^= data.length
      h1 ^= h1 >>> 16
      h1 *= 0x85ebca6b
      h1 ^= h1 >>> 13
      h1 *= 0xc2b2ae35
      h1 ^= h1 >>> 16
      h1
    }
  }
}
