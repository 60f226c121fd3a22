package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Table sort orders: data files keep rows sorted on the declared key, so
  * per-file bounds are tight and disjoint — the file-pruning payoff. */
class SortOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  test("sorted writes produce disjoint file bounds; point queries prune to one file") {
    val url = java.nio.file.Files.createTempDirectory("graft_sort").toString + "/t"
    IcebergWriter.createTable(spark, url, schema, sortOrder = Seq("k" -> "asc"))
    val t0 = IcebergTable.load(spark, url)
    assert(t0.metadata.defaultSortOrder.map(_.direction) == Seq("asc"))
    assert(t0.sortOrderColumns == Seq("k" -> "asc"))

    // shuffled input: the writer must range-partition + sort it (AQE off so
    // the tiny test input still fans out to several files)
    val shuffled = new scala.util.Random(7).shuffle((1L to 400L).toList)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try IcebergWriter.append(spark, url,
      shuffled.map(i => (i, s"c$i")).toDF("k", "cat").repartition(4))
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)

    val t = IcebergTable.load(spark, url)
    val files = t.liveFiles()
    assert(files.size > 1, "need multiple files to prove pruning")
    // bounds must not overlap across files
    val bounds = files.map { f =>
      val lo = IcebergTypes.decodeBound(f.lowerBounds(1), "long").asInstanceOf[Long]
      val hi = IcebergTypes.decodeBound(f.upperBounds(1), "long").asInstanceOf[Long]
      (lo, hi)
    }.sortBy(_._1)
    bounds.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlapping bounds: $bounds")
      case _ => ()
    }
    // a point query prunes to exactly one file; values are intact
    assert(t.prunedFiles(Pruning.Eq("k", 137L)).size == 1)
    assert(t.read().count() == 400)
    assert(t.read(filters = Seq(Seq(("k", "==", 137)))).count() == 1)
  }

  test("dropping the sort column resets the table to unsorted") {
    val url = java.nio.file.Files.createTempDirectory("graft_sortd").toString + "/t"
    IcebergWriter.createTable(spark, url, schema, sortOrder = Seq("k" -> "asc"))
    IcebergWriter.dropColumn(spark, url, "k")
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.defaultSortOrderId == 0, "dangling sort order must reset")
    assert(t.sortOrderColumns.isEmpty)
    // dropping an unrelated column keeps the order
    val url2 = java.nio.file.Files.createTempDirectory("graft_sortd2").toString + "/t"
    IcebergWriter.createTable(spark, url2, schema, sortOrder = Seq("k" -> "asc"))
    IcebergWriter.dropColumn(spark, url2, "cat")
    assert(IcebergTable.load(spark, url2).sortOrderColumns == Seq("k" -> "asc"))
  }

  test("compaction restores the sorted disjoint layout") {
    val url = java.nio.file.Files.createTempDirectory("graft_sortc").toString + "/t"
    IcebergWriter.createTable(spark, url, schema, sortOrder = Seq("k" -> "asc"))
    // two interleaved appends: across-file bounds now overlap
    IcebergWriter.append(spark, url,
      (1L to 100L).map(i => (i, "a")).toDF("k", "cat"))
    IcebergWriter.append(spark, url,
      (50L to 150L).map(i => (i, "b")).toDF("k", "cat"))
    Maintenance.compact(spark, url)
    val t = IcebergTable.load(spark, url)
    assert(t.read().count() == 201)
    val files = t.liveFiles()
    if (files.size > 1) {
      val bounds = files.map { f =>
        (IcebergTypes.decodeBound(f.lowerBounds(1), "long").asInstanceOf[Long],
          IcebergTypes.decodeBound(f.upperBounds(1), "long").asInstanceOf[Long])
      }.sortBy(_._1)
      bounds.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $bounds")
        case _ => ()
      }
    }
  }

  test("the native catalog write honors the sort order too") {
    val wh = java.nio.file.Files.createTempDirectory("graft_sortcat").toString
    val url = s"$wh/db/s"
    IcebergWriter.createTable(spark, url, schema, sortOrder = Seq("k" -> "asc"))
    val cat = s"so${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    // big enough that the ordered distribution fans out over several tasks
    spark.sql(s"INSERT INTO $cat.db.s SELECT id, concat('c', id) FROM range(1, 401)")
    val t = IcebergTable.load(spark, url)
    val files = t.liveFiles()
    if (files.size > 1) {
      val bounds = files.map { f =>
        val lo = IcebergTypes.decodeBound(f.lowerBounds(1), "long").asInstanceOf[Long]
        val hi = IcebergTypes.decodeBound(f.upperBounds(1), "long").asInstanceOf[Long]
        (lo, hi)
      }.sortBy(_._1)
      bounds.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlapping bounds: $bounds")
        case _ => ()
      }
      assert(t.prunedFiles(Pruning.Eq("k", 200L)).size == 1)
    }
    assert(spark.table(s"$cat.db.s").count() == 400)
  }
}
