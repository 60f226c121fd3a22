package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot rollback ([[IcebergWriter.rollbackTo]]): metadata-only undo of
  * bad commits, with the rolled-back history still time-travelable and
  * later commits chaining off the restored snapshot. */
class RollbackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("rollback rewinds current state; history stays; commits chain on") {
    val url = java.nio.file.Files.createTempDirectory("graft_rb").toString + "/t"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 5L).map(i => (i, "good")).toDF("k", "v"))
    val good = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    IcebergWriter.append(spark, url, (6L to 9L).map(i => (i, "bad")).toDF("k", "v"))
    val bad = IcebergTable.load(spark, url).currentSnapshot.snapshotId

    IcebergWriter.rollbackTo(spark, url, good)
    val t = IcebergTable.load(spark, url)
    assert(t.currentSnapshot.snapshotId == good)
    assert(t.refs("main").snapshotId == good)
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq == (1L to 5L))
    // the bad snapshot remains time-travelable until expiration
    assert(t.atSnapshot(bad).read().count() == 9)

    // the next commit chains off the RESTORED snapshot
    IcebergWriter.append(spark, url, Seq((10L, "after")).toDF("k", "v"))
    val t2 = IcebergTable.load(spark, url)
    assert(t2.currentSnapshot.parentSnapshotId.contains(good))
    assert(t2.read().as[(Long, String)].collect().map(_._1).sorted.toSeq
      == ((1L to 5L) :+ 10L))
  }

  test("AS OF inside a rolled-back era resolves the snapshot that actually " +
      "served reads then (snapshot-log, not the parent chain)") {
    val url = java.nio.file.Files.createTempDirectory("graft_rbts").toString + "/t"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v"))
    val good = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    Thread.sleep(5) // distinct log timestamps
    IcebergWriter.append(spark, url, Seq((2L, "b")).toDF("k", "v"))
    val t1 = IcebergTable.load(spark, url)
    val bad = t1.currentSnapshot.snapshotId
    val badEra = t1.currentSnapshot.timestampMs
    Thread.sleep(5)
    IcebergWriter.rollbackTo(spark, url, good)

    val t = IcebergTable.load(spark, url)
    // bad is NOT a parent-chain ancestor anymore, but at `badEra` it WAS
    // the table every reader saw — AS OF must keep serving it
    assert(!t.mainAncestorIds.contains(bad))
    assert(t.asOfTimestamp(badEra).currentSnapshot.snapshotId == bad,
      "AS OF must resolve via the snapshot-log, not skip to older data")
    assert(t.asOfTimestamp(badEra).read().count() == 2)
    // after the rollback instant, AS OF resolves the restored snapshot
    assert(t.asOfTimestamp(System.currentTimeMillis())
      .currentSnapshot.snapshotId == good)
  }

  test("history table: rolled-back entries read is_current_ancestor = false") {
    val url = java.nio.file.Files.createTempDirectory("graft_rbh").toString + "/t"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v"))
    val good = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    IcebergWriter.append(spark, url, Seq((2L, "bad")).toDF("k", "v"))
    val bad = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    IcebergWriter.rollbackTo(spark, url, good)
    IcebergWriter.append(spark, url, Seq((3L, "after")).toDF("k", "v"))

    val hist = IcebergTable.load(spark, url).historyDf
      .select("snapshot_id", "is_current_ancestor")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    // log: good, bad, good-again (rollback), after — in made-current order
    assert(hist.map(_._1).toSeq.take(2) == Seq(good, bad))
    assert(hist.count(_._1 == good) == 2, "rollback re-logs the target")
    val byId = hist.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byId(good) == Set(true), "restored snapshot is a current ancestor")
    assert(byId(bad) == Set(false),
      "the rolled-back snapshot must read is_current_ancestor = false — " +
        "the audit signal the history table exists for")
  }

  test("rollback refuses non-ancestors and unknown snapshots") {
    val url = java.nio.file.Files.createTempDirectory("graft_rb2").toString + "/t"
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v"))
    val s1 = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    IcebergWriter.append(spark, url, Seq((2L, "b")).toDF("k", "v"))
    val s2 = IcebergTable.load(spark, url).currentSnapshot.snapshotId

    intercept[IllegalArgumentException] {
      IcebergWriter.rollbackTo(spark, url, 424242L)
    }
    // roll back to s1, then s2 (still in metadata) is NOT an ancestor
    IcebergWriter.rollbackTo(spark, url, s1)
    intercept[IllegalArgumentException] {
      IcebergWriter.rollbackTo(spark, url, s2)
    }
    // no-op rollback to the current snapshot commits nothing
    val vBefore = IcebergTable.load(spark, url).version
    IcebergWriter.rollbackTo(spark, url, s1)
    assert(IcebergTable.load(spark, url).version == vBefore)
  }
}
