package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Session-conf write-audit-publish (Iceberg's `spark.wap.id` /
  * `spark.wap.branch` controls): with `write.wap.enabled` on the table,
  * plain SQL INSERTs stage instead of publishing — a ref-less snapshot
  * stamped with the wap.id, or a branch commit — and main moves only at
  * publish. Without the table opt-in the confs are inert. */
class WapSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withCatalog(f: (String, String) => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wapsess").toString
    val cat = s"ws${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try f(cat, wh)
    finally {
      spark.conf.unset("spark.wap.id")
      spark.conf.unset("spark.wap.branch")
    }
  }

  test("spark.wap.id stages a ref-less snapshot; publish_changes lands it") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.w (k BIGINT) " +
        "TBLPROPERTIES ('write.wap.enabled'='true')")
      spark.sql(s"INSERT INTO $cat.db.w VALUES (1), (2)")
      val mainHead = IcebergTable.load(spark, s"$wh/db/w")
        .currentSnapshot.snapshotId

      spark.conf.set("spark.wap.id", "job-77")
      spark.sql(s"INSERT INTO $cat.db.w VALUES (100), (200)")

      val t = IcebergTable.load(spark, s"$wh/db/w")
      // main NEVER moved; the staged snapshot exists ref-less with the id
      assert(t.currentSnapshot.snapshotId == mainHead)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.w").head.getLong(0) == 2)
      val staged = t.metadata.snapshots
        .find(_.summary.get("wap.id").contains("job-77")).get
      assert(staged.parentSnapshotId.contains(mainHead))
      assert(!t.refs.values.exists(_.snapshotId == staged.snapshotId),
        "wap.id staging must not create any ref")
      // audit: the staged state is time-travelable by snapshot id
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.w " +
        s"VERSION AS OF ${staged.snapshotId}").head.getLong(0) == 4)

      // duplicate wap.id refuses — one id names one auditable commit
      intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.db.w VALUES (300)")
      }
      spark.conf.unset("spark.wap.id")

      spark.sql(s"CALL $cat.system.publish_changes(table => 'db.w', " +
        "wap_id => 'job-77')")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.w").head.getLong(0) == 4)
      val head = IcebergTable.load(spark, s"$wh/db/w").currentSnapshot
      assert(head.summary.get("published-wap-id").contains("job-77"))
    }
  }

  test("spark.wap.branch stages on a branch; fast_forward publishes") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.b (k BIGINT) " +
        "TBLPROPERTIES ('write.wap.enabled'='true')")
      spark.sql(s"INSERT INTO $cat.db.b VALUES (1)")

      spark.conf.set("spark.wap.branch", "audit")
      spark.sql(s"INSERT INTO $cat.db.b VALUES (10), (11)")
      spark.conf.unset("spark.wap.branch")

      assert(spark.sql(s"SELECT count(*) FROM $cat.db.b").head.getLong(0) == 1)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.b VERSION AS OF 'audit'")
        .head.getLong(0) == 3, "the branch sees fork + staged rows")

      spark.sql(s"CALL $cat.system.fast_forward(table => 'db.b', " +
        "branch => 'audit')")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.b").head.getLong(0) == 3)
    }
  }

  test("non-append writes REFUSE while a WAP session is active: staging " +
      "is append-only, publishing to main would bypass the audit gate") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.r (k BIGINT) " +
        "TBLPROPERTIES ('write.wap.enabled'='true')")
      spark.sql(s"INSERT INTO $cat.db.r VALUES (1), (2)")
      spark.conf.set("spark.wap.branch", "audit")
      // INSERT OVERWRITE is not an append — it must throw, not silently
      // publish straight to main while the user believes writes stage
      val e = intercept[Exception] {
        spark.sql(s"INSERT OVERWRITE $cat.db.r VALUES (9)")
      }
      def rootMsg(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
      assert(rootMsg(e).contains("write-audit-publish"))
      spark.conf.unset("spark.wap.branch")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.r").head.getLong(0) == 2,
        "main must be untouched after the refused overwrite")
    }
  }

  test("TIMESTAMP AS OF resolves main ancestors only: a newer STAGED wap " +
      "snapshot never leaks through any timestamp resolver") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.ts (k BIGINT) " +
        "TBLPROPERTIES ('write.wap.enabled'='true')")
      spark.sql(s"INSERT INTO $cat.db.ts VALUES (1), (2)")
      spark.conf.set("spark.wap.id", "audit-ts")
      spark.sql(s"INSERT INTO $cat.db.ts VALUES (100), (200), (300)")
      spark.conf.unset("spark.wap.id")

      val t = IcebergTable.load(spark, s"$wh/db/ts")
      val staged = t.metadata.snapshots
        .find(_.summary.get("wap.id").contains("audit-ts")).get
      val mainHead = t.currentSnapshot.snapshotId
      assert(staged.snapshotId != mainHead)
      // a wall-clock strictly after the staged commit: the staged snapshot
      // is the NEWEST fit by timestamp, but it was never published
      val ms = math.max(staged.timestampMs, t.currentSnapshot.timestampMs) + 1000

      // 1. direct API
      assert(t.asOfTimestamp(ms).currentSnapshot.snapshotId == mainHead,
        "asOfTimestamp must skip the staged non-ancestor")
      // 2. SQL TIMESTAMP AS OF through the path catalog (micros → ms)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.ts TIMESTAMP AS OF " +
        s"timestamp_millis(${ms}L)").head.getLong(0) == 2,
        "TIMESTAMP AS OF must return main's rows, not staged ones")
      // 3. the as-of-ms reader option
      assert(spark.read.format("graft-iceberg")
        .option("as-of-ms", ms.toString).load(s"$wh/db/ts").count() == 2)
      // 4. changelog-view timestamp bound: the staged commit must not
      // enter the changelog range
      spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.ts', " +
        s"end_timestamp_ms => ${ms}L)")
      val commits = spark.sql(
        "SELECT DISTINCT _commit_snapshot_id FROM ts_changes")
        .collect().map(_.getLong(0)).toSet
      assert(!commits.contains(staged.snapshotId),
        "changelog view must not include the staged commit")
      spark.catalog.dropTempView("ts_changes")
      // 5. rollback_to_timestamp already filters (r15); publishing then
      // resolving at `ms` still lands on the PUBLISH commit, not staged-id
      spark.sql(s"CALL $cat.system.publish_changes(table => 'db.ts', " +
        "wap_id => 'audit-ts')")
      val t2 = IcebergTable.load(spark, s"$wh/db/ts")
      assert(t2.asOfTimestamp(System.currentTimeMillis())
        .read().count() == 5, "after publish the rows are visible")
    }
  }

  test("wap confs are inert without the table's write.wap.enabled opt-in") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.n (k BIGINT)")
      spark.conf.set("spark.wap.id", "ignored")
      spark.sql(s"INSERT INTO $cat.db.n VALUES (1), (2)")
      spark.conf.unset("spark.wap.id")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.n").head.getLong(0) == 2,
        "a normal publish — the conf must not stage without table opt-in")
      assert(IcebergTable.load(spark, s"$wh/db/n").metadata.snapshots
        .forall(!_.summary.contains("wap.id")))
    }
  }
}
