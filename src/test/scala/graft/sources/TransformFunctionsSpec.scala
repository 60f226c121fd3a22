package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The full Iceberg transform-function family through SQL
  * (`cat.truncate/years/months/days/hours`, joining `cat.bucket`):
  * spec Appendix B vectors, negative-value flooring, and agreement with
  * the metadata plane's transform evaluation. */
class TransformFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val wh = java.nio.file.Files.createTempDirectory("graft_fn").toString
    s.conf.set("spark.sql.catalog.fncat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set("spark.sql.catalog.fncat.warehouse", wh)
    s
  }

  private def one(sql: String): Any = spark.sql(sql).head.get(0)

  test("truncate: ints/longs floor to the width multiple (negatives too)") {
    assert(one("SELECT fncat.truncate(10, 1)") == 0)
    assert(one("SELECT fncat.truncate(10, 99)") == 90)
    assert(one("SELECT fncat.truncate(10, -1)") == -10, "floored, not toward zero")
    assert(one("SELECT fncat.truncate(3, CAST(-7 AS BIGINT))") == -9L)
    assert(one("SELECT fncat.truncate(16, CAST(NULL AS INT))") == null)
  }

  test("truncate: strings keep W chars, decimals floor unscaled, binary W bytes") {
    assert(one("SELECT fncat.truncate(3, 'iceberg')") == "ice")
    assert(one("SELECT fncat.truncate(10, 'ice')") == "ice")
    // spec example: truncate[50](decimal(10,2) 10.65) -> 10.50
    assert(one("SELECT fncat.truncate(50, CAST(10.65 AS DECIMAL(10,2)))")
      .toString == "10.50")
    assert(java.util.Arrays.equals(
      one("SELECT fncat.truncate(2, X'0102030405')").asInstanceOf[Array[Byte]],
      Array[Byte](1, 2)))
  }

  test("years/months/days/hours match the spec's 1970 offsets") {
    val ts = "TIMESTAMP '2017-11-16 22:31:08'"
    assert(one(s"SELECT fncat.years($ts)") == 47)
    assert(one(s"SELECT fncat.months($ts)") == (2017 - 1970) * 12 + 10)
    assert(one(s"SELECT fncat.days($ts)").toString == "2017-11-16",
      "days renders as a DATE, like Iceberg's Spark function")
    assert(one(s"SELECT fncat.hours($ts)") == 419686)

    // pre-epoch values floor (spec: offsets may be negative)
    val old = "TIMESTAMP '1969-12-31 23:59:59'"
    assert(one(s"SELECT fncat.years($old)") == -1)
    assert(one(s"SELECT fncat.days($old)").toString == "1969-12-31")

    // date inputs work for years/months/days; hours refuses
    assert(one("SELECT fncat.months(DATE '1970-03-01')") == 2)
    intercept[Exception] { spark.sql("SELECT fncat.hours(DATE '1970-03-01')").collect() }
  }

  test("SQL transforms agree with the write path's partition tuples") {
    import spark.implicits._
    val wh = spark.conf.get("spark.sql.catalog.fncat.warehouse")
    spark.sql("CREATE TABLE fncat.db.tr (k BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO fncat.db.tr SELECT id, CAST(id AS STRING) FROM range(0, 50)")
    // every row's SQL-computed bucket equals its FILE's partition value —
    // the function catalog and the writer share one murmur3 kernel
    val mismatches = spark.sql(
      "SELECT k, fncat.bucket(8, k) AS b FROM fncat.db.tr").as[(Long, Int)]
      .collect().toMap
    val t = graft.iceberg.IcebergTable.load(spark, s"$wh/db/tr")
    // manifest decode domain-normalizes int -> long
    val byFile = t.liveFiles().map(f =>
      f.partition.values.head.asInstanceOf[Long].toInt ->
        spark.read.parquet(t.resolvePath(f.filePath)).select("k").as[Long].collect())
    byFile.foreach { case (bucketVal, ks) =>
      ks.foreach(k => assert(mismatches(k) == bucketVal,
        s"k=$k: SQL bucket ${mismatches(k)} != file partition $bucketVal"))
    }
  }
}
