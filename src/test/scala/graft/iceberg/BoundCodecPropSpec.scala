package graft.iceberg

import org.scalacheck.{Gen, Prop, Properties}

import graft.iceberg.IcebergTypes.{decodeBound, encodeBound, normalizeLiteral}

/** Round-trip fuzz for the single-value bound codec — the bytes every
  * pruning decision reads and every write path records. For each Iceberg
  * primitive: `decode(encode(normalize(v))) == normalize(v)`, so a value
  * that goes through a manifest comes back the EXACT comparable the
  * pruning evaluator normalizes predicate literals to. A drift here is a
  * silent wrong-prune on every table. */
object BoundCodecPropSpec extends Properties("BoundCodec") {

  private def roundTrips(t: String, v: Any): Boolean = {
    val n = normalizeLiteral(v, t)
    val back = decodeBound(encodeBound(n, t), t)
    val ok = (back, n) match {
      case (a: Array[Byte], b: Array[Byte]) => a.sameElements(b)
      case (a, b) => a == b
    }
    if (!ok) println(s"CODEC DRIFT [$t]: $v -> norm $n -> back $back")
    ok
  }

  property("long family (long/time/timestamp/ns) round-trips any int64") =
    Prop.forAll(Gen.oneOf("long", "time", "timestamp", "timestamptz",
      "timestamp_ns"), Gen.choose(Long.MinValue, Long.MaxValue)) { (t, v) =>
      roundTrips(t, v)
    }

  property("int/date round-trips the int32 range (normalized to Long)") =
    Prop.forAll(Gen.oneOf("int", "date"),
      Gen.choose(Int.MinValue.toLong, Int.MaxValue.toLong)) { (t, v) =>
      roundTrips(t, v)
    }

  property("double round-trips bit-exactly, including subnormals and ±0") =
    Prop.forAll(Gen.oneOf(
      Gen.choose(-1e300, 1e300),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, Double.MaxValue,
        Double.MinValue))) { v =>
      roundTrips("double", v)
    }

  property("float round-trips through its normalized double form") =
    Prop.forAll(Gen.choose(-3.4e38f, 3.4e38f)) { f =>
      // float bounds normalize to Double; the codec narrows and re-widens —
      // a Float's exact double image survives that round trip
      roundTrips("float", f.toDouble)
    }

  property("string round-trips arbitrary unicode (incl. astral plane)") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(3)),
      Gen.oneOf("é", "π", "中", "🎉", "\n", "'", "\"", "")))
      .map(_.mkString)) { s =>
      roundTrips("string", s)
    }

  property("decimal round-trips at its declared scale") =
    Prop.forAll(Gen.choose(-1000000000L, 1000000000L),
      Gen.choose(0, 6)) { (unscaled, scale) =>
      val t = s"decimal(18, $scale)"
      roundTrips(t, BigDecimal(java.math.BigDecimal.valueOf(unscaled, scale)))
    }

  property("uuid round-trips the canonical string form") =
    Prop.forAll(Gen.uuid) { u => roundTrips("uuid", u.toString) }

  property("boolean and binary round-trip") =
    Prop.forAll(Gen.oneOf(true, false),
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { (b, bytes) =>
      roundTrips("boolean", b) && roundTrips("binary", bytes.toArray)
    }

  property("date/timestamp STRING literals normalize to the codec domain") =
    Prop.forAll(Gen.choose(-30000L, 30000L)) { days =>
      val d = java.time.LocalDate.ofEpochDay(days)
      normalizeLiteral(d.toString, "date") == days &&
        roundTrips("date", d.toString)
    }
}
