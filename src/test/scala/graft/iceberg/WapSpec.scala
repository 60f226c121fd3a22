package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish: [[IcebergWriter.appendToBranch]] stages snapshots
  * on a branch main readers never see; [[IcebergWriter.fastForward]]
  * publishes them atomically; divergence refuses. */
class WapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_wap").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  test("staged appends are invisible on main until fast-forward publishes") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a"), (2L, "b")).toDF("k", "cat"))

    IcebergWriter.appendToBranch(spark, url,
      Seq((3L, "staged")).toDF("k", "cat"), "audit")
    IcebergWriter.appendToBranch(spark, url,
      Seq((4L, "staged")).toDF("k", "cat"), "audit")

    val t = IcebergTable.load(spark, url)
    // main unmoved: same snapshot, same rows, log has only the base commit
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(1L, 2L))
    assert(t.refs("main").snapshotId == t.currentSnapshot.snapshotId)
    // the audit read sees base + BOTH staged appends, stacked
    assert(t.atBranch("audit").read().as[(Long, String)].collect()
      .map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // staged snapshots chain: audit head's ancestry reaches main's head
    val head = t.atBranch("audit").currentSnapshot
    assert(t.snapshots(head.parentSnapshotId.get).parentSnapshotId
      .contains(t.currentSnapshot.snapshotId))

    IcebergWriter.fastForward(spark, url, "audit")
    val after = IcebergTable.load(spark, url)
    assert(after.read().as[(Long, String)].collect().map(_._1).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    assert(after.currentSnapshot.snapshotId == after.refs("audit").snapshotId)
    assert(after.refs("main").snapshotId == after.currentSnapshot.snapshotId)
    // publishing again is a no-op (no new metadata version)
    val v = after.version
    IcebergWriter.fastForward(spark, url, "audit")
    assert(IcebergTable.load(spark, url).version == v)
  }

  test("fast-forward refuses when main advanced past the fork point") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "cat"))
    IcebergWriter.appendToBranch(spark, url, Seq((2L, "s")).toDF("k", "cat"), "audit")
    // main moves on its own → branch head no longer descends from main
    IcebergWriter.append(spark, url, Seq((9L, "m")).toDF("k", "cat"))
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, url, "audit")
    }
    assert(e.getMessage.contains("not an ancestor"))
    // main's own data is intact
    assert(IcebergTable.load(spark, url).read().count() == 2)
  }

  test("branching an empty table stages its first snapshot") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.appendToBranch(spark, url, Seq((1L, "s")).toDF("k", "cat"), "audit")
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.currentSnapshotId < 0, "main still has no snapshot")
    assert(t.atBranch("audit").read().count() == 1)
    IcebergWriter.fastForward(spark, url, "audit")
    assert(IcebergTable.load(spark, url).read().count() == 1)
  }

  test("expireSnapshots keeps a staged branch's ancestry so it stays publishable") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "cat"))
    IcebergWriter.append(spark, url, Seq((2L, "b")).toDF("k", "cat"))
    // two STACKED staged appends: audit's head chains through an
    // intermediate staged snapshot that no ref points to directly
    IcebergWriter.appendToBranch(spark, url, Seq((3L, "s")).toDF("k", "cat"), "audit")
    IcebergWriter.appendToBranch(spark, url, Seq((4L, "s")).toDF("k", "cat"), "audit")

    Maintenance.expireSnapshots(spark, url, keepLast = 1)
    val t = IcebergTable.load(spark, url)
    // main's first append expired; the branch chain (fork head + both
    // staged snapshots) survived via the branch-ancestry rule
    assert(t.snapshots.size == 3,
      s"expected {main head, 2 staged}, got ${t.snapshots.keys}")
    assert(t.atBranch("audit").read().count() == 4)

    // the audited work is still publishable — the ancestor walk must not
    // hit a hole where the intermediate staged snapshot used to be
    IcebergWriter.fastForward(spark, url, "audit")
    assert(IcebergTable.load(spark, url).read()
      .as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("expiration: a TAG on an intermediate staged snapshot must not cut the branch chain") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "cat"))
    // three STACKED staged appends; tag the MIDDLE one — the ancestry walk
    // must continue THROUGH the kept tag snapshot down to main's chain,
    // or the first staged snapshot expires and publish hits a hole
    IcebergWriter.appendToBranch(spark, url, Seq((2L, "s")).toDF("k", "cat"), "audit")
    IcebergWriter.appendToBranch(spark, url, Seq((3L, "s")).toDF("k", "cat"), "audit")
    IcebergWriter.appendToBranch(spark, url, Seq((4L, "s")).toDF("k", "cat"), "audit")
    val mid = {
      val t = IcebergTable.load(spark, url)
      t.snapshots(t.atBranch("audit").currentSnapshot.parentSnapshotId.get)
    }
    IcebergWriter.tag(spark, url, "mid-pin", Some(mid.snapshotId))

    Maintenance.expireSnapshots(spark, url, keepLast = 1)
    val t = IcebergTable.load(spark, url)
    assert(t.snapshots.size == 4,
      s"expected {main head, 3 staged}, got ${t.snapshots.keys}")
    assert(t.atSnapshot(mid.snapshotId).read().count() == 3, "tag readable")

    IcebergWriter.fastForward(spark, url, "audit")
    assert(IcebergTable.load(spark, url).read()
      .as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("expiration: a DIVERGED branch keeps its full ancestry below main's retained chain") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "cat"))
    IcebergWriter.append(spark, url, Seq((2L, "b")).toDF("k", "cat"))
    // branch forks at main's head (snapshot of "b"), then main moves on —
    // the fork point is now BELOW main's keepLast=1 chain
    IcebergWriter.appendToBranch(spark, url, Seq((3L, "s")).toDF("k", "cat"), "dev")
    IcebergWriter.append(spark, url, Seq((9L, "m")).toDF("k", "cat"))

    Maintenance.expireSnapshots(spark, url, keepLast = 1)
    val t = IcebergTable.load(spark, url)
    // dev's ancestry (fork point AND its parent) survives in full: the
    // branch must stay readable even though none of its chain is on main's
    // retained chain
    assert(t.atBranch("dev").read().as[(Long, String)].collect()
      .map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq
      == Seq(1L, 2L, 9L), "main unaffected")
    // diverged: publish still refuses (nothing expired out from under the
    // refusal check)
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, url, "dev")
    }
    assert(e.getMessage.contains("not an ancestor"))
  }

  test("guards: tags cannot fast-forward; branch commits are append-only") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "cat"))
    IcebergWriter.tag(spark, url, "pin")
    intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, url, "pin")
    }
    intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, url, "nope")
    }
    intercept[IllegalArgumentException] {
      IcebergWriter.appendToBranch(spark, url, Seq((2L, "b")).toDF("k", "cat"), "main")
    }
  }
}
