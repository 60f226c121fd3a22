package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergWriter

/** Runtime (dynamic partition) filtering on the DSv2 scan
  * ([[GraftIcebergScan.filter]]): a join against a filtered dimension
  * narrows the fact scan's file set at EXECUTION time, before any fact
  * bytes are read. */
class RuntimeFilteringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // deterministic planning for the plan-shape assertions
    .config("spark.sql.adaptive.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("a dim-join runtime filter prunes fact files before execution") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val factUrl = s"$dir/fact"
    // identity-partitioned fact: one file per category
    IcebergWriter.createTable(spark, factUrl, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType))),
      partitions = Seq(("cat", "identity")))
    IcebergWriter.append(spark, factUrl,
      (1L to 80L).map(i => (i, s"c${i % 8}")).toDF("k", "cat"))

    // DPP plans only when the build side carries a SELECTIVE predicate over
    // a real relation (a bare LocalRelation folds away) — write the dim out
    val dimPath = s"$dir/dim"
    (0 until 8).map(i => (s"c$i", if (i == 1 || i == 2) "keep" else "drop"))
      .toDF("cat", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"tag" === "keep")
    val fact = spark.read.format("graft-iceberg").load(factUrl)
    val joined = fact.join(dim, "cat")

    // collect `joined` itself: plan inspection below must target the SAME
    // QueryExecution that ran (a derived Dataset plans its own scan)
    val rows = joined.collect().map(_.getAs[Long]("k")).sorted
    assert(rows.toSeq == (1L to 80L).filter(i => i % 8 == 1 || i % 8 == 2))

    // the executed plan's scan must have been narrowed to the 2 joined
    // categories' files (8 files total, one per category)
    val scans = joined.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    val graftScan = scans.collectFirst { case s: GraftIcebergScan => s }
    assert(graftScan.isDefined, s"no graft scan in plan: $scans")
    assert(graftScan.get.scanFiles.size == 2,
      s"runtime filter kept ${graftScan.get.scanFiles.size} files, expected 2")
  }

  test("correctness is unchanged when the runtime filter prunes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp2").toString
    val factUrl = s"$dir/fact"
    IcebergWriter.createTable(spark, factUrl, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType))),
      partitions = Seq(("cat", "identity")))
    IcebergWriter.append(spark, factUrl,
      (1L to 40L).map(i => (i, s"c${i % 4}")).toDF("k", "cat"))
    val dim = (0 until 4).map(i => (s"c$i", i)).toDF("cat", "n")
    val joined = spark.read.format("graft-iceberg").load(factUrl).join(dim, "cat")
    assert(joined.count() == 40)
  }
}
