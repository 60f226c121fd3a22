package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v2 EQUALITY deletes: key-tuple delete files applied merge-on-read
  * with commit-sequence scoping, and the upsert path built on them — no data
  * file is read or rewritten at write time. */
class EqualityDeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_eqdel").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  test("upsert rewrites no data file and reads return the latest rows") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"old$i")).toDF("k", "cat").coalesce(1))
    val filesBefore = IcebergTable.load(spark, url).liveFiles()
      .map(_.filePath).toSet

    IcebergWriter.upsert(spark, url,
      Seq((3L, "new3"), (11L, "new11")).toDF("k", "cat").coalesce(1), Seq("k"))

    val t = IcebergTable.load(spark, url)
    // the original data file is still live and untouched — O(source) commit
    assert(filesBefore.subsetOf(t.liveFiles().map(_.filePath).toSet),
      "upsert must not rewrite existing data files")
    assert(t.equalityDeleteFiles.nonEmpty)
    val got = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == ((1L to 10L).filterNot(_ == 3L).map(i => (i, s"old$i")) ++
      Seq((3L, "new3"), (11L, "new11"))).sortBy(_._1))
    // metadata cannot count exactly under equality deletes — must be honest
    assert(t.countFromStats().isEmpty)
  }

  test("sequence scoping: deletes apply only to files committed earlier") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "old")).toDF("k", "cat"))
    IcebergWriter.upsert(spark, url, Seq((1L, "new")).toDF("k", "cat"), Seq("k"))
    // a LATER plain append of the same key must survive the earlier delete
    IcebergWriter.append(spark, url, Seq((1L, "newer")).toDF("k", "cat"))
    val got = IcebergTable.load(spark, url).read()
      .as[(Long, String)].collect().map(_._2).sorted.toSeq
    assert(got == Seq("new", "newer"))
  }

  test("standalone equalityDelete removes keys without touching data files") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 20L).map(i => (i, s"c${i % 2}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.equalityDelete(spark, url,
      Seq(Tuple1(5L), Tuple1(6L), Tuple1(7L)).toDF("k"), Seq("k"))
    val t = IcebergTable.load(spark, url)
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      ((1L to 4L) ++ (8L to 20L)))
    assert(t.summary("operation") == "delete")
    assert(t.summary("added-equality-deletes") == "3")
    // filtered reads and column pruning still work under the widened schema
    assert(t.read().filter(org.apache.spark.sql.functions.col("k") < 10).count() == 6)
    assert(t.read().select("cat").count() == 17)
  }

  test("compaction folds equality deletes and restores exact stats") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 30L).map(i => (i, "a")).toDF("k", "cat").coalesce(1))
    IcebergWriter.upsert(spark, url,
      Seq((10L, "up10"), (31L, "up31")).toDF("k", "cat").coalesce(1), Seq("k"))
    Maintenance.compact(spark, url, targetFiles = Some(1))
    val t = IcebergTable.load(spark, url)
    assert(t.liveDeleteFiles.isEmpty)
    assert(t.read().count() == 31)
    assert(t.countFromStats().contains(31L))
    assert(t.read().filter($"k" === 10L).as[(Long, String)].head()._2 == "up10")
  }

  test("equality deletes survive whole-file deletes of unrelated files") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, "a")).toDF("k", "cat").coalesce(1))
    IcebergWriter.append(spark, url,
      (11L to 20L).map(i => (i, "b")).toDF("k", "cat").coalesce(1))
    // eq-delete a key in file 2, then drop file 1 whole
    IcebergWriter.equalityDelete(spark, url, Seq(Tuple1(15L)).toDF("k"), Seq("k"))
    IcebergWriter.deleteWhere(spark, url, Pruning.LtEq("k", 10))
    val t = IcebergTable.load(spark, url)
    assert(t.equalityDeleteFiles.nonEmpty, "equality deletes must survive file drops")
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      ((11L to 20L).filterNot(_ == 15L)))
  }

  test("sequence scoping survives snapshot expiration") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "old")).toDF("k", "cat")) // snap A
    IcebergWriter.upsert(spark, url, Seq((1L, "new")).toDF("k", "cat"), Seq("k")) // snap B
    IcebergWriter.append(spark, url, Seq((2L, "x")).toDF("k", "cat")) // snap C
    // expire A: its data file stays LIVE (carried by newer manifests) but
    // the snapshot that added it leaves the metadata — ordering must come
    // from the persisted sequence numbers, not list position
    Maintenance.expireSnapshots(spark, url, keepLast = 2)
    val t = IcebergTable.load(spark, url)
    assert(t.snapshots.size == 2)
    val got = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "new"), (2L, "x")),
      "the equality delete must still apply to the expired snapshot's live file")
  }

  test("binary key columns compare by value, not reference") {
    val url = freshTable
    val bschema = StructType(Seq(
      StructField("bk", BinaryType), StructField("v", LongType)))
    IcebergWriter.createTable(spark, url, bschema)
    IcebergWriter.append(spark, url,
      Seq((Array[Byte](1, 2, 3), 1L), (Array[Byte](4, 5), 2L))
        .toDF("bk", "v").coalesce(1))
    // Array[Byte].equals is reference-based: a Seq[Any]-keyed probe would
    // silently never match and resurrect the deleted row
    IcebergWriter.equalityDelete(spark, url,
      Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("bk"), Seq("bk"))
    val got = IcebergTable.load(spark, url).read()
      .select("v").as[Long].collect().toSeq
    assert(got == Seq(2L), "binary-keyed equality delete must remove its row")
  }

  test("scan planning resolves key names from snapshot schemas: ZERO footer probes") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 30L).map(i => (i, s"v$i")).toDF("k", "cat").coalesce(1))
    // a CDC-ish chain of upserts → many equality-delete files
    (1 to 5).foreach { r =>
      IcebergWriter.upsert(spark, url,
        Seq((r.toLong, s"r$r"), (30L + r, s"n$r")).toDF("k", "cat").coalesce(1),
        Seq("k"))
    }
    assert(IcebergTable.load(spark, url).equalityDeleteFiles.size >= 5)
    graft.sources.GraftIcebergSource.footerProbes.set(0)
    val got = IcebergTable.load(spark, url).read()
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got.size == 35)
    assert(got.filter(_._1 <= 5).map(_._2) == (1 to 5).map(r => s"r$r"))
    assert(graft.sources.GraftIcebergSource.footerProbes.get() == 0,
      "equality-delete planning must not open parquet footers on the driver")
  }

  test("deletes written BEFORE a key rename still apply (write-time names from metadata)") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 10L).map(i => (i, s"old$i")).toDF("k", "cat").coalesce(1))
    IcebergWriter.upsert(spark, url,
      Seq((3L, "new3")).toDF("k", "cat").coalesce(1), Seq("k"))
    // the delete file's column is named "k"; the table's is now "id"
    IcebergWriter.renameColumn(spark, url, "k", "id")
    graft.sources.GraftIcebergSource.footerProbes.set(0)
    val got = IcebergTable.load(spark, url).read()
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == ((1L to 10L).filterNot(_ == 3L).map(i => (i, s"old$i")) :+
      (3L, "new3")).sortBy(_._1), "pre-rename equality delete must still apply")
    assert(graft.sources.GraftIcebergSource.footerProbes.get() == 0,
      "write-time key names resolve from the adding snapshot's schema, not footers")
  }

  test("position and equality deletes compose on the same table") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (1L to 20L).map(i => (i, "a")).toDF("k", "cat").coalesce(1))
    IcebergWriter.deleteRows(spark, url,
      Pruning.And(Pruning.GtEq("k", 1), Pruning.Lt("k", 4))) // pos deletes 1-3
    IcebergWriter.equalityDelete(spark, url,
      Seq(Tuple1(10L), Tuple1(11L)).toDF("k"), Seq("k"))
    val t = IcebergTable.load(spark, url)
    assert(t.positionDeleteFiles.nonEmpty && t.equalityDeleteFiles.nonEmpty)
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      ((4L to 9L) ++ (12L to 20L)))
  }
}
