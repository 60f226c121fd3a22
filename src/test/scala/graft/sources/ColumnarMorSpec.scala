package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ColumnarToRowExec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}

/** COLUMNAR merge-on-read: position deletes are applied by a per-batch
  * selection view over the vectorized reader's column vectors, so a scan
  * over a partially-deleted table stays on the ColumnarBatch path end to
  * end — one deleted-from file no longer de-vectorizes the whole scan. */
class ColumnarMorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_colmor").toString + "/t"

  private def isColumnar(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect {
      case c: ColumnarToRowExec => c
    }.nonEmpty

  private def makeTable(): (String, IcebergTable) = {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType))))
    IcebergWriter.append(spark, url,
      (1L to 100L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.append(spark, url,
      (101L to 200L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    // splits file 1 only: rows 40..59 deleted by position
    IcebergWriter.deleteRows(spark, url,
      Pruning.And(Pruning.GtEq("k", 40), Pruning.Lt("k", 60)))
    (url, IcebergTable.load(spark, url))
  }

  test("a partially-deleted table reads COLUMNAR with deletes applied") {
    val (url, t) = makeTable()
    assert(t.positionDeleteFiles.nonEmpty)
    val df = spark.read.format("graft-iceberg").load(url)
    assert(isColumnar(df), s"scan fell off the columnar path:\n" +
      df.queryExecution.executedPlan)
    assert(df.count() == 180)
    assert(df.select("k").as[Long].collect().sorted.toSeq ==
      ((1L to 39L) ++ (60L to 200L)))
  }

  test("pushed filters + row-group skipping stay exact under columnar MOR") {
    val (url, _) = makeTable()
    val df = spark.read.format("graft-iceberg").load(url)
      .filter(col("k") >= 50 && col("k") <= 120)
    assert(isColumnar(df))
    assert(df.select("k").as[Long].collect().sorted.toSeq == (60L to 120L))
    // projection narrower than the delete bookkeeping still works
    val proj = spark.read.format("graft-iceberg").load(url)
      .filter(col("k") < 45).select("cat")
    assert(isColumnar(proj))
    assert(proj.count() == 39)
  }

  test("equality deletes read COLUMNAR via per-batch key-probe selection") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType))))
    IcebergWriter.append(spark, url,
      (1L to 20L).map(i => (i, "a")).toDF("k", "cat").coalesce(1))
    IcebergWriter.equalityDelete(spark, url,
      Seq(Tuple1(5L), Tuple1(6L)).toDF("k"), Seq("k"))
    val df = spark.read.format("graft-iceberg").load(url)
    assert(isColumnar(df),
      "equality deletes must stay columnar (selection view, no vector copy)")
    assert(df.select("k").as[Long].collect().sorted.toSeq ==
      ((1L to 4L) ++ (7L to 20L)))
    // a pruned projection NOT containing the key column still applies the
    // deletes (key columns ride the widened read schema)
    assert(spark.read.format("graft-iceberg").load(url)
      .select("cat").count() == 18)
  }

  test("position + equality deletes together stay columnar and exact") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType))))
    IcebergWriter.append(spark, url,
      (1L to 30L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.deleteRows(spark, url, graft.iceberg.Pruning.Eq("k", 10L))
    IcebergWriter.equalityDelete(spark, url,
      Seq(Tuple1(20L), Tuple1(21L)).toDF("k"), Seq("k"))
    val df = spark.read.format("graft-iceberg").load(url)
    assert(isColumnar(df))
    assert(df.select("k").as[Long].collect().sorted.toSeq ==
      (1L to 30L).filterNot(Set(10L, 20L, 21L)))
  }

  test("delta UPDATE output reads columnar end-to-end") {
    val wh = java.nio.file.Files.createTempDirectory("graft_colmor_dml").toString
    val cat = s"cm${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, cat STRING)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, 'a' FROM range(1, 1001, 1, 1)")
    spark.sql(s"UPDATE $cat.db.t SET cat = 'u' WHERE k = 500")
    val df = spark.table(s"$cat.db.t")
    assert(isColumnar(df),
      "a merge-on-read table with position deltas must scan columnar")
    assert(df.count() == 1000)
    assert(df.filter(col("cat") === "u").select("k").as[Long].head() == 500L)
  }
}
