package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v3 DEFAULT VALUES: `initial-default` fills reads of files
  * written before the field existed (wired into Spark's existence-default
  * machinery — constant vector fill, no per-row cost in new files);
  * `write-default` fills writes that omit the column. The boundary the
  * spec draws — post-add files read their ACTUAL values, including
  * explicit nulls — is pinned here. */
class DefaultValuesSpec extends AnyFunSuite {

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

  test("initial-default: pre-add files read the default, post-add files their values") {
    val url = fresh("graft_dflt")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)) // pre-add file
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.addColumn(spark, url, "score", "int", default = Some(42))
    // post-add file with an ACTUAL value and an EXPLICIT null
    IcebergWriter.append(spark, url,
      Seq((3L, "c", Some(7)), (4L, "d", None: Option[Int]))
        .toDF("k", "v", "score").coalesce(1))
    val t = IcebergTable.load(spark, url)
    val rows = t.read().select("k", "score").as[(Long, Option[Int])]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      1L -> Some(42), 2L -> Some(42), // initial-default, not null
      3L -> Some(7), // actual value wins
      4L -> None), // explicit null in a post-add file STAYS null
      s"got $rows")
  }

  test("filters on a defaulted column match pre-add rows") {
    val url = fresh("graft_dflt_f")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.addColumn(spark, url, "score", "long", default = Some(42L))
    IcebergWriter.append(spark, url,
      Seq((3L, "c", 42L), (4L, "d", 5L)).toDF("k", "v", "score").coalesce(1))
    val t = IcebergTable.load(spark, url)
    val hit = t.read().filter("score = 42").select("k")
      .as[Long].collect().sorted.toSeq
    assert(hit == Seq(1L, 2L, 3L),
      s"row-group pushdown must not drop pre-add files on a defaulted filter: $hit")
  }

  test("write-default: an append omitting the column gets it filled") {
    val url = fresh("graft_dflt_w")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v").coalesce(1))
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.addColumn(spark, url, "tag", "string", default = Some("untagged"))
    // writer does not know about the new column — write-default fills it
    IcebergWriter.append(spark, url, Seq((2L, "b")).toDF("k", "v").coalesce(1))
    val t = IcebergTable.load(spark, url)
    val rows = t.read().select("k", "tag").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(1L -> "untagged", 2L -> "untagged"))
    // the post-add file PHYSICALLY carries the value (a write-time fill,
    // not a read-side patch): exactly one of the two live files has it
    val withTag = t.liveFiles().map(f => t.resolvePath(f.filePath))
      .count(p => spark.read.parquet(p).columns.contains("tag"))
    assert(withTag == 1)
  }

  test("REQUIRED add demands a default; v2 tables refuse defaults") {
    val url = fresh("graft_dflt_req")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] { // v2 table, defaults are v3
      IcebergWriter.addColumn(spark, url, "n", "int", default = Some(1))
    }
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    intercept[IllegalArgumentException] { // required without default
      IcebergWriter.addColumn(spark, url, "n", "int", required = true)
    }
    IcebergWriter.addColumn(spark, url, "n", "int", required = true,
      default = Some(9))
    val t = IcebergTable.load(spark, url)
    assert(t.read().select("n").as[Int].collect().toSeq == Seq(9))
    // the ICEBERG schema records required; the Spark read schema relaxes
    // to nullable so pre-add files pass the vectorized reader's check
    assert(t.iceSchema.fields.find(_.name == "n").exists(_.required))
  }

  test("typed defaults: string, double, date, decimal survive the round trip") {
    val url = fresh("graft_dflt_types")
    IcebergWriter.createTable(spark, url, schema)
    IcebergWriter.append(spark, url, Seq((1L, "a")).toDF("k", "v").coalesce(1))
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.addColumn(spark, url, "s", "string", default = Some("x'y"))
    IcebergWriter.addColumn(spark, url, "d", "double", default = Some(2.5))
    IcebergWriter.addColumn(spark, url, "dt", "date", default = Some("2024-03-01"))
    IcebergWriter.addColumn(spark, url, "m", "decimal(9, 2)", default = Some("12.34"))
    val t = IcebergTable.load(spark, url)
    val r = t.read().select("s", "d", "dt", "m").collect().head
    assert(r.getString(0) == "x'y") // quote survives SQL-literal escaping
    assert(r.getDouble(1) == 2.5)
    assert(r.getDate(2).toString == "2024-03-01")
    assert(r.getDecimal(3).toPlainString == "12.34")
    // the metadata JSON carries the spec's single-value forms
    val f = t.iceSchema.fields.find(_.name == "s").get
    assert(f.initialDefault.exists(_.asText == "x'y"))
    assert(f.writeDefault.exists(_.asText == "x'y"))
  }
}
