package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.rand
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering ([[Maintenance.zorder]]): after the rewrite, point
  * queries on EITHER clustered column prune most files via per-file bounds
  * — the multi-dimensional data-skipping property a single-column sort
  * cannot give. */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("x", LongType), StructField("y", LongType),
    StructField("payload", StringType)))

  test("zorder tightens per-file bounds on both columns; data is unchanged") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    // a 64x64 grid written in RANDOM order across 8 files: every file spans
    // nearly the full range of both x and y, so nothing prunes
    val grid = (0L until 4096L).map(k => (k % 64, k / 64, s"p$k"))
    IcebergWriter.append(spark, url,
      grid.toDF("x", "y", "payload").orderBy(rand(7)).repartition(8))

    val before = IcebergTable.load(spark, url)
    val totalBefore = before.liveFiles().size
    assert(totalBefore == 8)
    assert(before.prunedFiles(Pruning.Eq("x", 10L)).size == totalBefore,
      "random layout: a point query scans every file")

    Maintenance.zorder(spark, url, Seq("x", "y"), targetFiles = Some(16))

    val after = IcebergTable.load(spark, url)
    assert(after.summary("operation") == "replace")
    assert(after.summary.get("graft-zorder-by").contains("x,y"))
    val total = after.liveFiles().size
    assert(total >= 8, s"expected a multi-file layout, got $total")
    // the z-curve gives locality on BOTH dimensions: a point query on
    // either column now skips at least half the files
    val prunedX = after.prunedFiles(Pruning.Eq("x", 10L)).size
    val prunedY = after.prunedFiles(Pruning.Eq("y", 10L)).size
    assert(prunedX <= total / 2, s"x=10 kept $prunedX of $total files")
    assert(prunedY <= total / 2, s"y=10 kept $prunedY of $total files")
    // content identical
    assert(after.read().as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      == grid.sortBy(r => (r._1, r._2)))
    // and the result is still correct through the pruned scan
    assert(after.read(filters = Seq(Seq(("x", "==", 10))))
      .as[(Long, Long, String)].collect().map(_._2).sorted.toSeq == (0L until 64L))
  }

  test("zorder folds row-level deletes like compact") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      (0L until 100L).map(k => (k % 10, k / 10, s"p$k")).toDF("x", "y", "payload"))
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("payload", "p42"))
    Maintenance.zorder(spark, url, Seq("x", "y"), targetFiles = Some(4))
    val t = IcebergTable.load(spark, url)
    assert(t.positionDeleteFiles.isEmpty, "deletes folded into the rewrite")
    assert(t.read().count() == 99)
  }

  test("partitioned table z-orders WITHIN partitions; pruning composes") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("x", LongType), StructField("y", LongType),
      StructField("cat", StringType))),
      partitions = Seq(("cat", "identity")))
    // two partitions, each a 32x32 grid in random order
    val grid = for (c <- Seq("a", "b"); k <- 0L until 1024L)
      yield (k % 32, k / 32, c)
    IcebergWriter.append(spark, url,
      grid.toDF("x", "y", "cat").orderBy(rand(11)).repartition(8))

    Maintenance.zorder(spark, url, Seq("x", "y"), targetFiles = Some(16))
    val t = IcebergTable.load(spark, url)
    assert(t.summary("operation") == "replace")
    val total = t.liveFiles().size
    assert(total >= 8, s"expected a multi-file layout, got $total")
    // partition pruning still engages (partition values intact)
    val inA = t.prunedFiles(Pruning.Eq("cat", "a"))
    assert(inA.nonEmpty && inA.size < total)
    // z-skipping works inside a partition: a point query on either
    // dimension combined with the partition filter prunes most files
    val px = t.prunedFiles(Pruning.And(Pruning.Eq("cat", "a"), Pruning.Eq("x", 5L))).size
    val py = t.prunedFiles(Pruning.And(Pruning.Eq("cat", "a"), Pruning.Eq("y", 5L))).size
    assert(px <= inA.size / 2, s"x=5 kept $px of ${inA.size} files in partition a")
    assert(py <= inA.size / 2, s"y=5 kept $py of ${inA.size} files in partition a")
    // content identical and exact through the pruned scan
    assert(t.read().count() == 2048)
    assert(t.read(filters = Seq(Seq(("cat", "==", "b"), ("x", "==", 5))))
      .as[(Long, Long, String)].collect().map(_._2).sorted.toSeq == (0L until 32L))
  }

  test("per-partition scaling: disjoint-range partitions still skip inside each") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("x", LongType), StructField("y", LongType),
      StructField("cat", StringType))),
      partitions = Seq(("cat", "identity")))
    // partitions live a MILLION apart: under global min/max scaling each
    // partition's 32x32 grid collapses into one or two z-codes and a point
    // query inside a partition skips nothing
    val grid = for ((c, off) <- Seq(("a", 0L), ("b", 1000000L)); k <- 0L until 1024L)
      yield (off + k % 32, off + k / 32, c)
    IcebergWriter.append(spark, url,
      grid.toDF("x", "y", "cat").orderBy(rand(13)).repartition(8))

    Maintenance.zorder(spark, url, Seq("x", "y"), targetFiles = Some(16))
    val t = IcebergTable.load(spark, url)
    val inA = t.prunedFiles(Pruning.Eq("cat", "a"))
    val inB = t.prunedFiles(Pruning.Eq("cat", "b"))
    assert(inA.nonEmpty && inB.nonEmpty)
    val pa = t.prunedFiles(Pruning.And(Pruning.Eq("cat", "a"), Pruning.Eq("x", 5L))).size
    val pb = t.prunedFiles(Pruning.And(Pruning.Eq("cat", "b"), Pruning.Eq("x", 1000005L))).size
    assert(pa <= inA.size / 2, s"x=5 kept $pa of ${inA.size} files in partition a")
    assert(pb <= inB.size / 2, s"x=1000005 kept $pb of ${inB.size} files in partition b")
    // content identical and exact through the pruned scan
    assert(t.read().as[(Long, Long, String)].collect().sortBy(r => (r._3, r._1, r._2)).toSeq
      == grid.sortBy(r => (r._3, r._1, r._2)))
    assert(t.read(filters = Seq(Seq(("cat", "==", "b"), ("x", "==", 1000005))))
      .as[(Long, Long, String)].collect().map(_._2).sorted.toSeq
      == (1000000L until 1000032L))
  }

  test("guards: sorted tables and bad columns refuse") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, 2L, "a")).toDF("x", "y", "payload"))
    intercept[IllegalArgumentException] {
      Maintenance.zorder(spark, url, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Maintenance.zorder(spark, url, Seq("x", "payload"))
    }
    intercept[IllegalArgumentException] {
      Maintenance.zorder(spark, url, Seq("x", "nope"))
    }
    val sortedUrl = freshTable
    IcebergWriter.createTable(spark, sortedUrl, schema, sortOrder = Seq(("x", "asc")))
    IcebergWriter.append(spark, sortedUrl, Seq((1L, 2L, "a")).toDF("x", "y", "payload"))
    intercept[IllegalArgumentException] {
      Maintenance.zorder(spark, sortedUrl, Seq("x", "y"))
    }
  }
}
