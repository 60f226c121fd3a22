package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest compaction ([[Maintenance.rewriteManifests]]): the metadata
  * plane shrinks to the target manifest count while data files, row
  * contents, per-file provenance (snapshot id / data sequence), delete
  * scoping, pruning, and time travel all stay intact. */
class RewriteManifestsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_rwm").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def dataManifests(t: IcebergTable) =
    t.manifestList.filter(_.content == Manifests.ManifestContent.Data)

  test("manifest count drops; files, rows, and provenance survive") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    (1 to 5).foreach(i => IcebergWriter.append(spark, url,
      ((i * 10L) until (i * 10L + 5)).map(j => (j, s"b$i")).toDF("k", "v").coalesce(1)))
    val before = IcebergTable.load(spark, url)
    val filesBefore = before.liveFiles()
      .map(f => (before.resolvePath(f.filePath), f.snapshotId, before.dataSequenceOf(f)))
      .sortBy(_._1)
    assert(dataManifests(before).size == 5)

    Maintenance.rewriteManifests(spark, url, targetManifests = 1)
    val after = IcebergTable.load(spark, url)
    assert(dataManifests(after).size == 1)
    assert(after.summary("operation") == "replace")
    // same files, same committing snapshots, same data sequences
    val filesAfter = after.liveFiles()
      .map(f => (after.resolvePath(f.filePath), f.snapshotId, after.dataSequenceOf(f)))
      .sortBy(_._1)
    assert(filesAfter == filesBefore)
    // rows unchanged; stats-pruning still works off the rewritten entries
    assert(after.read().as[(Long, String)].collect().map(_._1).sorted.toSeq
      == (1 to 5).flatMap(i => (i * 10L) until (i * 10L + 5)))
    assert(after.prunedFiles(Pruning.Eq("k", 31L)).size == 1)
    // count-from-stats still exact
    assert(after.countFromStats().contains(25L))
    // time travel to pre-rewrite snapshots still reads
    assert(after.snapshotRelative(-1).read().count() == 25L)
    // a no-op second rewrite commits nothing
    val v = after.version
    Maintenance.rewriteManifests(spark, url, targetManifests = 1)
    assert(IcebergTable.load(spark, url).version == v)
  }

  test("equality-delete sequence scoping survives the rewrite") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 5L).map(i => (i, "old")).toDF("k", "v").coalesce(1))
    // upsert: eq-deletes k=2 from the OLD file, adds a NEW file with k=2,9
    IcebergWriter.upsert(spark, url,
      Seq((2L, "new2"), (9L, "new9")).toDF("k", "v").coalesce(1), Seq("k"))
    IcebergWriter.append(spark, url, Seq((20L, "late")).toDF("k", "v").coalesce(1))
    val expected = Seq((1L, "old"), (2L, "new2"), (3L, "old"), (4L, "old"),
      (5L, "old"), (9L, "new9"), (20L, "late"))
    assert(IcebergTable.load(spark, url).read()
      .as[(Long, String)].collect().sortBy(_._1).toSeq == expected)

    Maintenance.rewriteManifests(spark, url, targetManifests = 1)
    val after = IcebergTable.load(spark, url)
    assert(dataManifests(after).size == 1)
    // the rewritten entries carry EXPLICIT sequences: the upsert's own file
    // (same sequence as the delete) and the later append (higher) must NOT
    // lose their rows to the equality delete; the old file still does
    assert(after.read().as[(Long, String)].collect().sortBy(_._1).toSeq == expected)
    // delete manifests carried over untouched
    assert(after.equalityDeleteFiles.nonEmpty)
  }

  test("position deletes and a changelog across the rewrite stay correct") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, (1L to 10L).map(i => (i, "a")).toDF("k", "v").coalesce(1))
    val from = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    IcebergWriter.append(spark, url, (11L to 14L).map(i => (i, "b")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 3L))
    Maintenance.rewriteManifests(spark, url, targetManifests = 1)
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 13)
    // the rewrite is content-neutral in the changelog (a `replace` op)
    val rows = t.changelog(from, t.currentSnapshot.snapshotId)
      .select("k", "_change_type").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((3L, "delete"), (11L, "insert"), (12L, "insert"),
      (13L, "insert"), (14L, "insert")))
  }

  test("partition-evolved table: per-spec manifests, pruning intact") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq(("v", "identity")))
    (1 to 3).foreach(i => IcebergWriter.append(spark, url,
      ((i * 10L) until (i * 10L + 4)).map(j => (j, s"c${j % 2}")).toDF("k", "v")))
    IcebergWriter.updatePartitionSpec(spark, url, Seq(("k", "bucket[2]")))
    IcebergWriter.append(spark, url,
      (100L to 107L).map(j => (j, s"c${j % 2}")).toDF("k", "v"))
    val before = IcebergTable.load(spark, url)
    val nBefore = dataManifests(before).size
    assert(nBefore > 2)

    Maintenance.rewriteManifests(spark, url, targetManifests = 2)
    val after = IcebergTable.load(spark, url)
    val rewritten = dataManifests(after)
    // one manifest per spec at minimum; strictly fewer than before
    assert(rewritten.size < nBefore)
    assert(rewritten.map(_.partitionSpecId).distinct.size == 2)
    assert(after.read().count() == before.read().count())
    // identity-partition pruning still engages through the new summaries
    assert(after.prunedFiles(Pruning.Eq("v", "c0")).nonEmpty)
    assert(after.prunedFiles(Pruning.Eq("v", "c0")).size
      < after.liveFiles().size)
  }
}
