package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Cherry-pick / publish_changes / set_current_snapshot: the WAP publish
  * paths that still work after main MOVED past the staging fork (where
  * fastForward soundly refuses), plus their SQL CALL surface. */
class CherryPickSpec extends AnyFunSuite {

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

  private def keys(url: String): Seq[Long] =
    IcebergTable.load(spark, url).read().select("k").as[Long].collect().sorted.toSeq

  /** Build: main=[1..10], stage [101..105] on audit branch (wap.id=w1),
    * then main advances with [11..15] — fork point left behind. */
  private def diverged(url: String): Long = {
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.appendToBranch(spark, url,
      (101L to 105L).map(i => (i, s"s$i")).toDF("k", "v").coalesce(1),
      "audit", extraSummary = Map("wap.id" -> "w1"))
    IcebergWriter.append(spark, url,
      (11L to 15L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    IcebergTable.load(spark, url).refs("audit").snapshotId
  }

  test("cherry-pick publishes a staged append past a moved main") {
    val url = fresh("graft_cp")
    val staged = diverged(url)

    // the fork moved: fast-forward must refuse (publishing would drop
    // main's [11..15] commit) — cherry-pick is the correct tool
    intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, url, "audit")
    }
    val newId = IcebergWriter.cherryPick(spark, url, staged)
    assert(newId != staged, "cherry-pick commits a NEW snapshot")
    assert(keys(url) == ((1L to 15L) ++ (101L to 105L)),
      "main rows + staged rows, nothing lost")

    val t = IcebergTable.load(spark, url)
    val head = t.currentSnapshot
    assert(head.snapshotId == newId)
    assert(head.summary.get("source-snapshot-id").contains(staged.toString))
    assert(head.summary.get("published-wap-id").contains("w1"))
    assert(head.summary.get("total-records").contains("20"))

    // double publish refuses: same manifests cannot land twice
    intercept[IllegalArgumentException] {
      IcebergWriter.cherryPick(spark, url, staged)
    }
  }

  test("cherry-pick refuses non-append snapshots and ancestors") {
    val url = fresh("graft_cp_refuse")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    val first = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    IcebergWriter.deleteWhere(spark, url, Pruning.Gt("k", 100L)) // no-op pred
    IcebergWriter.append(spark, url, Seq((11L, "b")).toDF("k", "v").coalesce(1))

    // an ancestor of main must refuse (it is already published)
    intercept[IllegalArgumentException] {
      IcebergWriter.cherryPick(spark, url, first)
    }
    // a delete/overwrite snapshot must refuse even when staged off-branch
    IcebergWriter.appendToBranch(spark, url,
      Seq((200L, "s")).toDF("k", "v").coalesce(1), "b2")
    val t = IcebergTable.load(spark, url)
    val overwriteSnap = t.metadata.snapshots
      .find(s => !s.summary.get("operation").contains("append"))
    overwriteSnap.foreach { s =>
      intercept[IllegalArgumentException] {
        IcebergWriter.cherryPick(spark, url, s.snapshotId)
      }
    }
  }

  test("row lineage survives cherry-pick: preserved disjoint _row_id ranges") {
    val url = fresh("graft_cp_lineage")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.appendToBranch(spark, url,
      (101L to 105L).map(i => (i, s"s$i")).toDF("k", "v").coalesce(1),
      "audit", extraSummary = Map("wap.id" -> "w1"))
    IcebergWriter.append(spark, url,
      (11L to 15L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    val staged = IcebergTable.load(spark, url).refs("audit").snapshotId
    IcebergWriter.cherryPick(spark, url, staged)

    val ids = IcebergTable.load(spark, url).read()
      .select(org.apache.spark.sql.functions.col("_row_id"))
      .as[Long].collect().sorted.toSeq
    // 20 rows, every id distinct: branch allocation came from the same
    // next-row-id counter, so the spliced manifests' ranges never collide
    assert(ids.size == 20)
    assert(ids.distinct.size == 20, s"row ids must stay disjoint: $ids")
  }

  test("cherry-pick re-sequences at publish: an equality delete committed " +
      "between stage and publish cannot MOR-delete the published rows") {
    val url = fresh("graft_cp_reseq")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.upgradeFormatVersion(spark, url, 2)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.appendToBranch(spark, url,
      (101L to 105L).map(i => (i, s"s$i")).toDF("k", "v").coalesce(1),
      "audit", extraSummary = Map("wap.id" -> "w1"))
    val staged = IcebergTable.load(spark, url).refs("audit").snapshotId
    // main gains an equality delete for the STAGED keys AFTER the fork —
    // its sequence is higher than the stage-time sequence, so splicing the
    // staged manifests unchanged would let it delete the published rows
    IcebergWriter.equalityDelete(spark, url,
      (101L to 105L).map(i => Tuple1(i)).toDF("k"), Seq("k"))
    IcebergWriter.cherryPick(spark, url, staged)
    val t = IcebergTable.load(spark, url)
    assert(keys(url) == ((1L to 10L) ++ (101L to 105L)),
      "published rows commit at the PUBLISH sequence — the earlier " +
        "equality delete must not apply to them")
    // the spliced manifests carry the new snapshot's sequence
    val eqSeq = t.liveDeleteFiles.map(t.dataSequenceOf).max
    val stagedPaths = t.atSnapshot(staged).liveFiles()
      .filter(_.snapshotId.contains(staged)).map(_.filePath).toSet
    val published = t.liveFiles().filter(f => stagedPaths(f.filePath))
    assert(published.nonEmpty &&
      published.forall(f => t.dataSequenceOf(f) > eqSeq),
      "published data files must sequence AFTER the intervening delete")
  }

  test("set_current_snapshot jumps to a non-ancestor; rollback refuses it") {
    val url = fresh("graft_setcur")
    val staged = diverged(url)
    intercept[IllegalArgumentException] {
      IcebergWriter.rollbackTo(spark, url, staged) // not an ancestor
    }
    IcebergWriter.setCurrentSnapshot(spark, url, staged)
    assert(keys(url) == ((1L to 10L) ++ (101L to 105L)),
      "head now reads the branch's history (fork + staged rows)")
    // the move is a history event; jumping back restores main's view
    val mainHead = IcebergTable.load(spark, url).metadata.snapshots
      .filter(_.summary.get("operation").contains("append"))
      .maxBy(_.sequenceNumber.getOrElse(0L))
    IcebergWriter.setCurrentSnapshot(spark, url, mainHead.snapshotId)
    assert(keys(url) == (1L to 15L))
  }

  test("SQL CALL: publish_changes by wap.id, ancestors_of lists the chain") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cp_sql").toString
    val cat = s"cp${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/t"
    diverged(url)

    intercept[Exception] {
      spark.sql(s"CALL $cat.system.publish_changes(table => 'db.t', wap_id => 'nope')").collect()
    }
    val res = spark.sql(
      s"CALL $cat.system.publish_changes(table => 'db.t', wap_id => 'w1')").head()
    assert(res.getLong(0) ==
      IcebergTable.load(spark, url).currentSnapshot.snapshotId)
    assert(keys(url) == ((1L to 15L) ++ (101L to 105L)))

    // ancestry: publish head → main head → first append (3 appends on the
    // main line now), newest first
    val anc = spark.sql(
      s"CALL $cat.system.ancestors_of(table => 'db.t')").collect()
    assert(anc.length == 3)
    assert(anc.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)),
      "newest first")
  }
}
