package graft.iceberg

import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.Manifests.{ManifestFile, PartitionFieldSummary}
import graft.iceberg.Pruning._

/** Manifest-tier pruning: partition-field summaries + hidden-partition
  * predicate rewrite through transforms (SURVEY §2A #6/#12). */
class ManifestPruningSpec extends AnyFunSuite {

  private def leInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(v).array()

  private def manifest(summaries: Seq[PartitionFieldSummary], specId: Int = 0) =
    ManifestFile("m.avro", 100, specId, None, summaries,
      Some(1), Some(0), Some(0), Some(10L), Some(0L), Some(0L))

  // schema: id(1): long, ts_day(2): date via day transform, name(3): string
  private val fields = Map(
    "id" -> FieldInfo(1, "id", "long"),
    "d" -> FieldInfo(2, "d", "date"),
    "name" -> FieldInfo(3, "name", "string"))

  test("identity partition summary prunes by range") {
    val ctx = Context(fields,
      PartitionSpec(0, Seq(PartitionField(1, 1000, "id", "identity"))))
    val mf = manifest(Seq(PartitionFieldSummary(containsNull = false, None,
      Some(java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(100L).array()),
      Some(java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(200L).array()))))
    assert(manifestMightMatch(Eq("id", 150), mf, ctx))
    assert(!manifestMightMatch(Eq("id", 99), mf, ctx))
    assert(!manifestMightMatch(Gt("id", 200), mf, ctx))
    assert(manifestMightMatch(GtEq("id", 200), mf, ctx))
    assert(manifestMightMatch(Eq("name", "x"), mf, ctx)) // not partitioned: keep
  }

  test("bucket transform: Eq/In rewritten, ranges NOT (soundness fix)") {
    val ctx = Context(fields,
      PartitionSpec(0, Seq(PartitionField(3, 1000, "name_bucket", "bucket[8]"))))
    val b = Transforms.parse("bucket[8]")
    val bucketOfX = b("x", "string").get.asInstanceOf[Long].toInt
    val mf = manifest(Seq(PartitionFieldSummary(containsNull = false, None,
      Some(leInt(bucketOfX)), Some(leInt(bucketOfX)))))
    // Eq on the source column consults the bucketed summary
    assert(manifestMightMatch(Eq("name", "x"), mf, ctx))
    // a value hashing to a different bucket is pruned
    val other = (0 until 100).map(i => s"v$i")
      .find(v => b(v, "string").get != bucketOfX.toLong).get
    assert(!manifestMightMatch(Eq("name", other), mf, ctx))
    // range predicates over a bucketed column must NOT prune (the reference
    // wrongly transforms literals for all ops, ice.py:295-300)
    assert(manifestMightMatch(Gt("name", "zzz"), mf, ctx))
    assert(manifestMightMatch(Lt("name", "aaa"), mf, ctx))
  }

  test("day transform: ranges rewritten through order-preserving transform") {
    val ctx = Context(fields,
      PartitionSpec(0, Seq(PartitionField(2, 1000, "d_day", "day"))))
    // summary covers days [17000, 17100]
    val mf = manifest(Seq(PartitionFieldSummary(containsNull = false, None,
      Some(leInt(17000)), Some(leInt(17100)))))
    assert(manifestMightMatch(Eq("d", java.time.LocalDate.ofEpochDay(17050)), mf, ctx))
    assert(!manifestMightMatch(Eq("d", java.time.LocalDate.ofEpochDay(16999)), mf, ctx))
    assert(!manifestMightMatch(Gt("d", java.time.LocalDate.ofEpochDay(17100)), mf, ctx))
    assert(manifestMightMatch(Gt("d", java.time.LocalDate.ofEpochDay(17099)), mf, ctx))
    assert(!manifestMightMatch(Lt("d", java.time.LocalDate.ofEpochDay(17000)), mf, ctx))
    // at the boundary day the transform can't distinguish sub-day precision:
    // must keep
    assert(manifestMightMatch(LtEq("d", java.time.LocalDate.ofEpochDay(17000)), mf, ctx))
  }

  test("contains_null drives IS NULL at manifest tier") {
    val ctx = Context(fields,
      PartitionSpec(0, Seq(PartitionField(1, 1000, "id", "identity"))))
    val noNull = manifest(Seq(PartitionFieldSummary(containsNull = false, None, None, None)))
    val withNull = manifest(Seq(PartitionFieldSummary(containsNull = true, None, None, None)))
    assert(!manifestMightMatch(IsNull("id"), noNull, ctx))
    assert(manifestMightMatch(IsNull("id"), withNull, ctx))
  }

  test("missing summaries keep the manifest") {
    val ctx = Context(fields,
      PartitionSpec(0, Seq(PartitionField(1, 1000, "id", "identity"))))
    val mf = manifest(Seq.empty)
    assert(manifestMightMatch(Eq("id", 5), mf, ctx))
  }
}
