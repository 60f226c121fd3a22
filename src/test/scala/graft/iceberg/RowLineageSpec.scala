package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v3 ROW LINEAGE: commits allocate [next-row-id, +added) inside
  * the optimistic commit loop; manifests carry the base; files inherit
  * cumulative slices at read time; `_row_id` = first_row_id + position.
  * Pre-lineage files read null row ids (the spec's upgrade rule). */
class RowLineageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  private def lineage(url: String): Seq[(Long, Option[Long], Long)] =
    IcebergTable.load(spark, url).read()
      .select(org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("_row_id"),
        org.apache.spark.sql.functions.col("_last_updated_sequence_number"))
      .as[(Long, Option[Long], Long)].collect().sortBy(_._1).toSeq

  test("appends allocate disjoint ascending id ranges; next-row-id advances") {
    val url = fresh("graft_rl")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.append(spark, url,
      (1L to 50L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(spark, url,
      (51L to 80L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.nextRowId == Some(80L))
    val rows = lineage(url)
    val ids = rows.flatMap(_._2)
    assert(ids.size == 80 && ids.distinct.size == 80, "row ids must be unique")
    assert(ids.min == 0L && ids.max == 79L, "ids cover [0, added) densely")
    // rows of the same file are consecutive: k=1..50 got one slice
    val file1 = rows.filter(_._1 <= 50L).flatMap(_._2)
    assert(file1.max - file1.min == 49L)
    // _last_updated_sequence_number = the committing sequence per file
    assert(rows.filter(_._1 <= 50L).map(_._3).distinct == Seq(1L))
    assert(rows.filter(_._1 > 50L).map(_._3).distinct == Seq(2L))
  }

  test("files written before the upgrade read null row ids") {
    val url = fresh("graft_rl_up")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      Seq((1L, "old")).toDF("k", "v").coalesce(1)) // pre-lineage
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.append(spark, url,
      Seq((2L, "new")).toDF("k", "v").coalesce(1))
    val rows = lineage(url)
    assert(rows.find(_._1 == 1L).get._2.isEmpty, "pre-lineage file: null id")
    assert(rows.find(_._1 == 2L).get._2 == Some(0L), "first allocated id")
  }

  test("row-level DELETE keeps surviving rows' ids stable") {
    val url = fresh("graft_rl_del")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.append(spark, url,
      (1L to 40L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    val before = lineage(url).map(r => r._1 -> r._2).toMap
    IcebergWriter.deleteRows(spark, url,
      Pruning.And(Pruning.GtEq("k", 10L), Pruning.Lt("k", 20L)))
    val after = lineage(url)
    assert(after.size == 30)
    after.foreach { case (k, id, _) =>
      assert(id == before(k), s"row $k changed id across a MOR delete")
    }
  }

  test("manifest rewrite materializes inherited ids explicitly") {
    val url = fresh("graft_rl_rw")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(spark, url, Seq((2L, "b")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(spark, url, Seq((3L, "c")).toDF("k", "v").coalesce(1))
    val before = lineage(url)
    IcebergWriter.rewriteManifests(spark, url, targetManifests = 1)
    val t = IcebergTable.load(spark, url)
    assert(t.manifestList.count(
      _.content == graft.iceberg.Manifests.ManifestContent.Data) == 1)
    assert(lineage(url) == before, "ids must survive the manifest rewrite")
    // and they are now EXPLICIT on the entries (no manifest base needed)
    assert(t.liveFiles().forall(_.firstRowId.isDefined))
  }

  test("compaction preserves row identity via materialized lineage columns") {
    val url = fresh("graft_rl_compact")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      Seq((1L, "old")).toDF("k", "v").coalesce(1)) // pre-lineage: null id
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.append(spark, url,
      (2L to 30L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(spark, url,
      (31L to 60L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 10L)) // DV rides along
    val before = lineage(url).map(r => r._1 -> (r._2, r._3)).toMap
    Maintenance.compact(spark, url, targetFiles = Some(1))
    val t = IcebergTable.load(spark, url)
    assert(t.liveFiles().size == 1 && t.positionDeleteFiles.isEmpty)
    val after = lineage(url)
    assert(after.size == before.size)
    after.foreach { case (k, id, seq) =>
      if (k == 1L)
        // the spec's LAZY ASSIGNMENT: a rewritten row that never had an id
        // gets one from the compaction's allocation
        assert(id.isDefined, "pre-lineage row must gain an id on rewrite")
      else {
        assert(id == before(k)._1, s"row $k changed id across compaction")
        assert(seq == before(k)._2, s"row $k changed last-updated seq")
      }
    }
    // a compacted-table read WITHOUT lineage columns is unaffected
    assert(t.read().columns.toSeq == Seq("k", "v"))
    // ...and a later append continues the allocation without overlap
    IcebergWriter.append(spark, url, Seq((61L, "c")).toDF("k", "v").coalesce(1))
    val ids = lineage(url).flatMap(_._2)
    assert(ids.distinct.size == ids.size, "post-compaction ids stay unique")
  }

  test("CONCURRENT appends allocate disjoint id ranges through the retry loop") {
    val url = fresh("graft_rl_conc")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val futures = (1 to 4).map { w =>
        Future {
          IcebergWriter.append(spark, url,
            (1L to 25L).map(i => (w * 100L + i, s"w$w")).toDF("k", "v").coalesce(1))
        }
      }
      Await.result(Future.sequence(futures), 120.seconds)
    } finally pool.shutdown()
    val t = IcebergTable.load(spark, url)
    assert(t.snapshots.size == 4)
    assert(t.metadata.nextRowId == Some(100L),
      s"4 x 25 rows must advance next-row-id to 100, got ${t.metadata.nextRowId}")
    val ids = lineage(url).flatMap(_._2)
    assert(ids.size == 100 && ids.distinct.size == 100,
      "racing committers must never allocate overlapping id ranges")
    assert(ids.min == 0L && ids.max == 99L, "allocation is dense across the race")
  }

  test("merge: updates PRESERVE _row_id and advance the sequence; inserts get fresh ids") {
    val url = fresh("graft_rl_merge")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    val before = lineage(url).map(r => r._1 -> r._2).toMap
    IcebergWriter.merge(spark, url,
      Seq((5L, "u5"), (11L, "u11")).toDF("k", "v").coalesce(1), Seq("k"))
    val after = lineage(url)
    // untouched rows keep their ids and their sequence
    after.filter(r => r._1 != 5L && r._1 != 11L).foreach { case (k, id, seq) =>
      assert(id == before(k), s"untouched row $k changed id")
      assert(seq == 1L)
    }
    // the UPDATED row keeps its identity — the v3 rule — with a new seq
    val (updId, updSeq) = after.find(_._1 == 5L).map(r => (r._2, r._3)).get
    assert(updId == before(5L), s"update must preserve _row_id: $updId vs ${before(5L)}")
    assert(updSeq == 2L, "update must advance _last_updated_sequence_number")
    // the INSERTED row allocates a fresh id
    val insId = after.find(_._1 == 11L).get._2
    assert(insId.exists(_ >= 10L), s"insert allocates a fresh id: $insId")
    assert(after.flatMap(_._2).distinct.size == 11, "ids stay unique")
  }
}
