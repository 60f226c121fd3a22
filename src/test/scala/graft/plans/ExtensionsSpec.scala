package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The count-from-stats optimizer rule: count(*) over a graft-iceberg
  * relation must collapse to a LocalRelation (zero data I/O) and return the
  * manifest-statistics count. */
class ExtensionsSpec extends AnyFunSuite {

  val FixtureDir = "/root/reference/test-data/my_table"
  val FixtureOrig = "/Users/mdurant/temp/warehouse/db/my_table"

  // a dedicated session: extensions are builder-time configuration, and
  // getOrCreate would silently reuse another suite's session — clear first
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  private def icebergDf = spark.read.format("graft-iceberg")
    .option("original-url", FixtureOrig).load(FixtureDir)

  test("count(*) is answered from manifest stats via LocalRelation") {
    val df = icebergDf.groupBy().count()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LocalRelation"), s"expected LocalRelation:\n$optimized")
    assert(!optimized.contains("RelationV2"), s"scan survived:\n$optimized")
    assert(df.collect().head.getLong(0) == 5L)
  }

  test("df.count() action uses the rule and matches a real scan") {
    assert(icebergDf.count() == 5L)
  }

  test("filtered count still scans (rule only fires on bare count)") {
    val df = icebergDf.filter("age > 30").groupBy().count()
    assert(df.collect().head.getLong(0) == 2L) // correct, via real scan
  }
}
