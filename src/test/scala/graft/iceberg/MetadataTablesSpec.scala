package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The extended Iceberg metadata-table family (`entries`, `all_*`,
  * `metadata_log_entries`, `position_deletes`), spec `metadata-log`
  * maintenance on every commit, and table-property commits
  * (SET/UNSET TBLPROPERTIES incl. the `previous-versions-max` trim). */
class MetadataTablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  private def build3Commits(url: String): Unit = {
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(spark, url,
      (11L to 20L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
  }

  test("entries shows lifecycle statuses; files table hides tombstones") {
    val url = fresh("graft_entries")
    build3Commits(url)
    // whole-file delete: the second append's file gets a DELETED entry
    IcebergWriter.deleteWhere(spark, url, Pruning.Gt("k", 10L))
    val t = IcebergTable.load(spark, url)
    val entries = t.entriesDf.collect()
    assert(entries.exists(_.getInt(0) == Manifests.Status.Deleted),
      "entries must expose the DELETED tombstone")
    val delPath = entries.filter(_.getInt(0) == Manifests.Status.Deleted)
      .map(_.getStruct(3).getString(1)).head
    assert(!t.filesDf.collect().map(_.getString(0)).contains(delPath),
      "files must NOT list the tombstoned file")
    // every entry row carries its committing snapshot + the file struct
    assert(entries.forall(r => !r.isNullAt(1)))
    assert(entries.forall(_.getStruct(3).getLong(4) > 0)) // record_count
  }

  test("all_entries/all_files span snapshots; all_manifests crosses refs") {
    val url = fresh("graft_allmeta")
    build3Commits(url)
    IcebergWriter.deleteWhere(spark, url, Pruning.Gt("k", 10L))
    val t = IcebergTable.load(spark, url)
    val nSnaps = t.metadata.snapshots.size
    assert(nSnaps == 3)

    // all_entries ⊇ entries (current snapshot's manifests are a subset)
    assert(t.allEntriesDf.count() >= t.entriesDf.count())
    // both appended files remain visible across history even though one
    // is tombstoned at head
    val allData = t.allDataFilesDf.collect()
    assert(allData.map(_.getString(1)).distinct.length == 2)
    // all_files = all_data_files + all_delete_files (no delete files here)
    assert(t.allFilesDf.count() ==
      t.allDataFilesDf.count() + t.allDeleteFilesDf.count())
    assert(t.allDeleteFilesDf.count() == 0)

    // one row per (manifest, referencing snapshot); every snapshot appears
    val am = t.allManifestsDf.collect()
    assert(am.map(_.getLong(8)).distinct.length == nSnaps)
    // a manifest carried forward by later snapshots repeats with each
    // reference_snapshot_id, so rows strictly exceed distinct manifests
    assert(am.length > am.map(_.getString(0)).distinct.length)
  }

  test("every commit appends metadata-log; metadata_log_entries serves it") {
    val url = fresh("graft_mlog")
    build3Commits(url) // create (v1) + 2 appends → v3, log = [v1, v2]
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.metadataLog.map(_._2) ==
      Seq(s"$url/metadata/v1.metadata.json", s"$url/metadata/v2.metadata.json"))

    val rows = t.metadataLogDf.collect()
    assert(rows.length == 3, "prior entries + the current file")
    assert(rows.last.getString(1).endsWith("v3.metadata.json"))
    // detail columns re-parse each prior file: v1 (create) has no
    // snapshot; v2 has the first append's snapshot
    assert(rows(0).isNullAt(2), "pre-first-snapshot metadata → null head")
    assert(rows(1).getLong(2) == t.metadata.snapshots.head.snapshotId)
    assert(rows.last.getLong(2) == t.metadata.currentSnapshotId)
    // timestamps ascend with history
    assert(rows.map(_.getTimestamp(0).getTime).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("previous-versions-max trims the log; reserved properties refuse") {
    val url = fresh("graft_mlog_trim")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.setProperties(spark, url,
      Map("write.metadata.previous-versions-max" -> "2"))
    (1L to 5L).foreach(i => IcebergWriter.append(spark, url,
      Seq((i, s"x$i")).toDF("k", "v").coalesce(1)))
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.properties("write.metadata.previous-versions-max") == "2")
    assert(t.metadata.metadataLog.size == 2, "log trimmed to the newest 2")
    // the retained tail is the two files the current one descends from
    assert(t.metadata.metadataLog.last._2 ==
      s"$url/metadata/v${t.version - 1}.metadata.json")

    // idempotent SET publishes no new version
    val v0 = t.version
    IcebergWriter.setProperties(spark, url,
      Map("write.metadata.previous-versions-max" -> "2"))
    assert(IcebergTable.load(spark, url).version == v0)

    // UNSET drops the key; reserved state keys refuse
    IcebergWriter.removeProperties(spark, url,
      Seq("write.metadata.previous-versions-max"))
    assert(!IcebergTable.load(spark, url).metadata.properties
      .contains("write.metadata.previous-versions-max"))
    intercept[IllegalArgumentException] {
      IcebergWriter.setProperties(spark, url, Map("format-version" -> "3"))
    }
  }

  test("position_deletes serves parquet carriers and v3 DV blobs as rows") {
    // v2 parquet position deletes
    val url2 = fresh("graft_pd_v2")
    IcebergWriter.createTable(spark, url2, schema)
    IcebergWriter.append(spark, url2,
      (1L to 50L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(spark, url2, Pruning.Lt("k", 6L))
    val pd2 = IcebergTable.load(spark, url2).positionDeletesDf.collect()
    assert(pd2.length == 5)
    assert(pd2.map(_.getLong(1)).sorted.toSeq == (0L to 4L))
    assert(pd2.forall(_.getString(2).endsWith(".parquet")))

    // v3 deletion vectors: same row surface, puffin carrier
    val url3 = fresh("graft_pd_v3")
    IcebergWriter.createTable(spark, url3, schema)
    IcebergWriter.append(spark, url3,
      (1L to 50L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.upgradeFormatVersion(spark, url3, 3)
    IcebergWriter.deleteRows(spark, url3, Pruning.Lt("k", 8L))
    val t3 = IcebergTable.load(spark, url3)
    val pd3 = t3.positionDeletesDf.collect()
    assert(pd3.length == 7)
    assert(pd3.forall(_.getString(2).endsWith(".puffin")))
    val dataFiles = t3.filesDf.collect().map(_.getString(0)).toSet
    assert(pd3.forall(r => dataFiles.contains(r.getString(0))),
      s"positions must reference live data files; got ${pd3.head.getString(0)} vs $dataFiles")
  }

  test("SQL: new metadata tables resolve; position_deletes plans distributed") {
    val wh = java.nio.file.Files.createTempDirectory("graft_meta_sql").toString
    val cat = s"m${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/t"
    build3Commits(url)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.deleteRows(spark, url, Pruning.Lt("k", 4L))

    assert(spark.sql(s"SELECT * FROM $cat.db.t.entries").count() >= 2)
    assert(spark.sql(s"SELECT * FROM $cat.db.t.all_manifests").count() >= 4)
    assert(spark.sql(
      s"SELECT * FROM $cat.db.t.metadata_log_entries").count() >= 4)
    assert(spark.sql(s"SELECT * FROM $cat.db.t.all_data_files").count() >= 2)

    val pd = spark.sql(s"SELECT * FROM $cat.db.t.position_deletes")
    assert(pd.count() == 3)
    // the V1Scan bridge keeps deleted positions OFF the driver: the plan
    // must be a real scan, not a LocalTableScan of collected rows
    val plan = pd.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"expected distributed scan:\n$plan")
  }

  test("SQL ALTER TABLE: properties and column evolution round-trip") {
    val wh = java.nio.file.Files.createTempDirectory("graft_alter_sql").toString
    val cat = s"a${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/t"
    build3Commits(url)

    spark.sql(s"ALTER TABLE $cat.db.t SET TBLPROPERTIES ('commit.retry.num-retries'='7', 'x'='1')")
    assert(IcebergTable.load(spark, url).metadata.properties("commit.retry.num-retries") == "7")
    spark.sql(s"ALTER TABLE $cat.db.t UNSET TBLPROPERTIES ('x')")
    assert(!IcebergTable.load(spark, url).metadata.properties.contains("x"))

    // the property surface round-trips through SHOW TBLPROPERTIES too
    val shown = spark.sql(s"SHOW TBLPROPERTIES $cat.db.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("commit.retry.num-retries").contains("7"))
    assert(shown.get("format-version").contains("1"))

    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN note STRING")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN note TO comment_text")
    val withCol = IcebergTable.load(spark, url)
    assert(withCol.schema.fieldNames.contains("comment_text"))
    // id-resolved evolution: pre-add files read the new column as null
    assert(withCol.read().where("comment_text IS NULL").count() == 20)
    spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN comment_text")
    assert(!IcebergTable.load(spark, url).schema.fieldNames.contains("comment_text"))
  }
}
