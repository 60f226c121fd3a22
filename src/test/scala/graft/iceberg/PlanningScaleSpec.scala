package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Scan-planning at metadata scale (round-8 verdict ask #6): past a
  * threshold the manifest Avro decode shards across executors, planning
  * telemetry reports live-file count and decoded-stats bytes, and a
  * configurable live-file cap fails loudly instead of letting a 100×-grown
  * table OOM the driver. */
class PlanningScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_planscale").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  /** A table with one manifest per commit: `n` appends → `n` manifests. */
  private def manyManifestTable(n: Int): String = {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    (1 to n).foreach { i =>
      IcebergWriter.append(spark, url,
        Seq((i.toLong, s"c$i")).toDF("k", "cat").coalesce(1))
    }
    url
  }

  test("manifest decode shards across executors past the threshold, same plan") {
    val url = manyManifestTable(12)
    val expected = IcebergTable.load(spark, url).liveFiles()
      .map(_.filePath).sorted // driver-side decode (threshold default 64)

    Manifests.clearCache() // force the scaled path to see uncached manifests
    spark.conf.set("spark.graft.iceberg.distributedManifestThreshold", "4")
    try {
      val before = Manifests.distributedDecodeJobs.get()
      val got = IcebergTable.load(spark, url).liveFiles().map(_.filePath).sorted
      assert(got == expected, "distributed decode must yield the same file list")
      assert(Manifests.distributedDecodeJobs.get() > before,
        "expected a distributed manifest-decode job past the threshold")
      // decoded entries are cached: a re-plan launches no second job
      val after = Manifests.distributedDecodeJobs.get()
      IcebergTable.load(spark, url).liveFiles()
      assert(Manifests.distributedDecodeJobs.get() == after)
    } finally spark.conf.unset("spark.graft.iceberg.distributedManifestThreshold")
  }

  test("planning telemetry reports live files and decoded-stats footprint") {
    val url = manyManifestTable(5)
    IcebergTable.load(spark, url).liveFiles()
    assert(IcebergTable.lastPlanningFiles.get() == 5)
    assert(IcebergTable.lastPlanningStatsBytes.get() > 0)
  }

  test("live-file cap refuses loudly instead of letting metadata eat the driver") {
    val url = manyManifestTable(6)
    spark.conf.set("spark.graft.iceberg.maxPlanningFiles", "3")
    try {
      val e = intercept[IllegalArgumentException] {
        IcebergTable.load(spark, url).liveFiles()
      }
      assert(e.getMessage.contains("6 live files") &&
        e.getMessage.contains("compact"), e.getMessage)
      // reads honor the same guard (planning funnels through liveFiles)
      intercept[IllegalArgumentException] {
        IcebergTable.load(spark, url).read().count()
      }
    } finally spark.conf.unset("spark.graft.iceberg.maxPlanningFiles")
    // with the cap lifted the same table scans fine
    assert(IcebergTable.load(spark, url).read().count() == 6)
  }
}
