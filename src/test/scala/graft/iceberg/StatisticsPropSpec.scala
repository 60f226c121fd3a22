package graft.iceberg

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, UpdateSketch}
import org.scalacheck.{Gen, Prop, Properties}

/** Property coverage for the NDV path's value feeding: estimates stay
  * within theta error across random cardinalities/duplication when values
  * go through the SPEC's single-value serialization (encodeBound), and
  * sketch UNION (the incremental path) equals the sketch of the union. */
object StatisticsPropSpec extends Properties("TableStatistics") {

  private def sketchOf(values: Seq[Any], t: String): Array[Byte] = {
    val s = UpdateSketch.builder().build()
    values.foreach(v => s.update(
      IcebergTypes.encodeBound(IcebergTypes.normalizeLiteral(v, t), t)))
    s.compact().toByteArray
  }

  private def estimate(bytes: Array[Byte]): Double =
    CompactSketch.wrap(Memory.wrap(bytes)).getEstimate

  private def close(est: Double, exact: Int): Boolean =
    math.abs(est - exact) <= math.max(2.0, exact * 0.05)

  property("longs: NDV within 5% across cardinalities and dup factors") =
    Prop.forAll(Gen.choose(1, 3000), Gen.choose(1, 5),
      Gen.choose(0L, 1000000L)) { (n, dup, offset) =>
      val values = (0 until n).flatMap(i => Seq.fill(dup)(offset + i * 7L))
      close(estimate(sketchOf(values, "long")), n)
    }

  property("strings: equal values collapse, distinct stay apart") =
    Prop.forAll(Gen.choose(1, 500)) { n =>
      val values = (0 until n).map(i => s"v$i") ++ (0 until n).map(i => s"v$i")
      close(estimate(sketchOf(values, "string")), n)
    }

  property("union of part sketches ≈ sketch of the union (incremental law)") =
    Prop.forAll(Gen.choose(1, 1000), Gen.choose(1, 1000),
      Gen.choose(0, 500)) { (a, b, overlap) =>
      val left = (0 until a).map(_.toLong)
      val start = a - math.min(overlap, a)
      val right = (start until start + b).map(_.toLong)
      val u = SetOperation.builder().buildUnion()
      u.union(CompactSketch.wrap(Memory.wrap(sketchOf(left, "long"))))
      u.union(CompactSketch.wrap(Memory.wrap(sketchOf(right, "long"))))
      val exact = (left ++ right).distinct.size
      close(u.getResult.getEstimate, exact) &&
        close(estimate(sketchOf(left ++ right, "long")), exact)
    }

  property("decimal/timestamp values round through the spec serialization") =
    Prop {
      val decs = Seq("1.50", "2.25", "1.50", "3.00").map(BigDecimal(_))
      val ts = Seq("2024-01-01T00:00:00", "2024-01-01T00:00:00",
        "2024-06-01T12:00:00")
      estimate(sketchOf(decs, "decimal(9,2)")) == 3.0 &&
        estimate(sketchOf(ts, "timestamp")) == 2.0
    }
}
