package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergTable

/** Merge-on-read row-level DML (`SupportsDelta`, the default dmlMode):
  * UPDATE/MERGE/DELETE commit position deletes + insert files instead of
  * rewriting data files — the shape frequent small DML needs at 100 TB. */
class RowDeltaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def withCatalog(f: (String, String) => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_delta").toString
    val cat = s"dl${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(cat, wh)
  }

  test("a 1-row UPDATE on a multi-file table rewrites ZERO data files") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, cat STRING)")
      spark.sql(s"INSERT INTO $cat.db.t SELECT id, 'a' FROM range(1, 51, 1, 2)")
      spark.sql(s"INSERT INTO $cat.db.t SELECT id, 'b' FROM range(51, 101, 1, 2)")
      val before = IcebergTable.load(spark, s"$wh/db/t")
      val filesBefore = before.liveFiles().map(_.filePath).toSet
      assert(filesBefore.size >= 2, "test needs a multi-file table")

      spark.sql(s"UPDATE $cat.db.t SET cat = 'updated' WHERE k = 7")

      val t = IcebergTable.load(spark, s"$wh/db/t")
      val filesAfter = t.liveFiles().map(_.filePath).toSet
      assert(filesBefore.subsetOf(filesAfter),
        "merge-on-read UPDATE must not rewrite or drop any existing data file")
      assert((filesAfter -- filesBefore).size == 1,
        "exactly one tiny insert file carries the updated row")
      assert(t.positionDeleteFiles.size == 1)
      assert(t.snapshots.size == 3, "the delta is ONE snapshot")
      // content: only k=7 changed
      val got = spark.sql(s"SELECT * FROM $cat.db.t ORDER BY k")
        .as[(Long, String)].collect().toSeq
      assert(got == (1L to 100L).map(i =>
        (i, if (i == 7) "updated" else if (i <= 50) "a" else "b")))
      // position deletes are exact 1-row subtractions → stats stay exact
      assert(t.countFromStats().contains(100L))
    }
  }

  test("MERGE INTO commits deletes + inserts in one snapshot, files intact") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.m (k BIGINT, cat STRING)")
      spark.sql(s"INSERT INTO $cat.db.m SELECT id, 'old' FROM range(1, 21, 1, 1)")
      val filesBefore = IcebergTable.load(spark, s"$wh/db/m")
        .liveFiles().map(_.filePath).toSet

      spark.sql(s"CREATE TABLE $cat.db.src (k BIGINT, cat STRING)")
      spark.sql(s"INSERT INTO $cat.db.src VALUES (5, 'up5'), (20, 'up20'), (21, 'new21')")
      spark.sql(
        s"""MERGE INTO $cat.db.m t USING $cat.db.src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

      val t = IcebergTable.load(spark, s"$wh/db/m")
      assert(filesBefore.subsetOf(t.liveFiles().map(_.filePath).toSet),
        "merge-on-read MERGE must keep every pre-existing data file")
      assert(t.positionDeleteFiles.nonEmpty)
      assert(t.snapshots.size == 2)
      val got = spark.sql(s"SELECT * FROM $cat.db.m ORDER BY k")
        .as[(Long, String)].collect().toSeq
      assert(got == (1L to 21L).map(i => (i,
        if (i == 5) "up5" else if (i == 20) "up20"
        else if (i == 21) "new21" else "old")))
      assert(t.countFromStats().contains(21L))
    }
  }

  test("non-translatable DELETE takes the delta path: position deletes only") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.d (k BIGINT, cat STRING)")
      spark.sql(s"INSERT INTO $cat.db.d SELECT id, 'x' FROM range(1, 31, 1, 1)")
      val filesBefore = IcebergTable.load(spark, s"$wh/db/d")
        .liveFiles().map(_.filePath).toSet

      // k % 7 = 0 is not an Iceberg predicate → bypasses the metadata-only
      // SupportsDelete path and runs the row-level delta protocol
      spark.sql(s"DELETE FROM $cat.db.d WHERE k % 7 = 0")

      val t = IcebergTable.load(spark, s"$wh/db/d")
      assert(t.liveFiles().map(_.filePath).toSet == filesBefore,
        "a pure delta DELETE adds no data file and removes none")
      assert(t.positionDeleteFiles.nonEmpty)
      assert(t.summary("operation") == "delete")
      val got = spark.sql(s"SELECT k FROM $cat.db.d ORDER BY k")
        .as[Long].collect().toSeq
      assert(got == (1L to 30L).filterNot(_ % 7 == 0))
    }
  }

  test("consecutive delta updates stack correctly (MOR scan feeds the next delta)") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.s (k BIGINT, cat STRING)")
      spark.sql(s"INSERT INTO $cat.db.s SELECT id, 'v0' FROM range(1, 11, 1, 1)")
      spark.sql(s"UPDATE $cat.db.s SET cat = 'v1' WHERE k = 3")
      // second update hits the ROW WRITTEN BY THE FIRST DELTA: its position
      // delete must target the new insert file, not the original
      spark.sql(s"UPDATE $cat.db.s SET cat = 'v2' WHERE k = 3")
      val got = spark.sql(s"SELECT * FROM $cat.db.s ORDER BY k")
        .as[(Long, String)].collect().toSeq
      assert(got == (1L to 10L).map(i => (i, if (i == 3) "v2" else "v0")))
      val t = IcebergTable.load(spark, s"$wh/db/s")
      assert(t.positionDeleteFiles.size == 2)
      assert(t.countFromStats().contains(10L))
      // compaction folds the delta chain back to plain files
      graft.iceberg.Maintenance.compact(spark, s"$wh/db/s", targetFiles = Some(1))
      val c = IcebergTable.load(spark, s"$wh/db/s")
      assert(c.positionDeleteFiles.isEmpty)
      assert(spark.sql(s"SELECT cat FROM $cat.db.s WHERE k = 3").as[String].head() == "v2")
    }
  }

  test("partitioned table: delta inserts land in the right partitions") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.p (k BIGINT, cat STRING) PARTITIONED BY (cat)")
      spark.sql(s"INSERT INTO $cat.db.p VALUES (1, 'a'), (2, 'a'), (3, 'b')")
      // moves row k=2 from partition a to partition b
      spark.sql(s"UPDATE $cat.db.p SET cat = 'b' WHERE k = 2")
      val got = spark.sql(s"SELECT * FROM $cat.db.p ORDER BY k")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "b")))
      val t = IcebergTable.load(spark, s"$wh/db/p")
      // partition listing reflects the move: metadata-only partition scan
      val bFiles = t.prunedFiles(graft.iceberg.Pruning.Eq("cat", "b"))
      assert(spark.read.parquet(
          bFiles.map(f => t.resolvePath(f.filePath)): _*)
        .count() == 2, "the moved row's insert file must sit in partition b")
    }
  }
}
