package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v3 VARIANT type end-to-end: createTable auto-raises to v3,
  * Spark's parquet variant group round-trips field-id-stamped (renames
  * stay safe), nulls and heterogeneous payloads survive, row-level deletes
  * work alongside a variant column, and v1/v2 tables refuse the type. */
class VariantSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  private def varTable(url: String): Unit = {
    val df = Seq(
      (1L, """{"a":1,"b":"x"}"""),
      (2L, """{"a":2,"b":"y","nested":{"deep":[1,2,3]}}"""),
      (3L, """[1,"two",3.5,null]"""), // top-level array payload
      (4L, null.asInstanceOf[String])) // null variant
      .toDF("k", "js")
      .select(col("k"), expr("parse_json(js)").as("v"))
    IcebergWriter.createTable(spark, url, df.schema)
    IcebergWriter.append(spark, url, df.coalesce(1))
  }

  test("variant schema births a v3 table and round-trips heterogeneous payloads") {
    val url = fresh("graft_variant")
    varTable(url)
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.formatVersion == 3, "variant demands v3 from birth")
    assert(t.metadata.nextRowId.isDefined, "v3 birth must set next-row-id")
    assert(t.iceSchema.fields.find(_.name == "v").get.icebergTypeString == "variant")
    assert(t.schema("v").dataType == VariantType)
    val back = t.read().select(col("k"), to_json(col("v")).as("js"))
      .as[(Long, String)].collect().toMap
    assert(back(1L) == """{"a":1,"b":"x"}""")
    assert(back(2L) == """{"a":2,"b":"y","nested":{"deep":[1,2,3]}}""")
    assert(back(3L) == """[1,"two",3.5,null]""")
    assert(back(4L) == null, "null variant must stay null")
    // typed extraction through the scan
    val a2 = t.read().filter(col("k") === 2L)
      .select(expr("variant_get(v, '$.nested.deep[2]', 'long')"))
      .as[Long].head()
    assert(a2 == 3L)
  }

  test("rename keeps variant data via field-id resolution") {
    val url = fresh("graft_variant_ren")
    varTable(url)
    IcebergWriter.renameColumn(spark, url, "v", "payload")
    val t = IcebergTable.load(spark, url)
    val js = t.read().filter(col("k") === 1L)
      .select(to_json(col("payload"))).as[String].head()
    assert(js == """{"a":1,"b":"x"}""", "renamed variant column must still resolve by id")
  }

  test("row-level delete works beside a variant column (no bounds claimed)") {
    val url = fresh("graft_variant_del")
    varTable(url)
    val t0 = IcebergTable.load(spark, url)
    // variant columns must claim NO min/max bounds (not orderable)
    val vId = t0.iceSchema.fields.find(_.name == "v").get.id
    assert(t0.liveFiles().forall(f =>
      !f.lowerBounds.contains(vId) && !f.upperBounds.contains(vId)),
      "variant columns must not carry bounds")
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 2L)) // splits the file -> DV
    val t = IcebergTable.load(spark, url)
    assert(t.positionDeleteFiles.nonEmpty && t.positionDeleteFiles.forall(_.isDv))
    assert(t.read().select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
  }

  test("variant refuses as partition source, sort key, and equality key") {
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("v", VariantType)))
    val p = intercept[IllegalArgumentException](IcebergWriter.createTable(
      spark, fresh("graft_var_part"), sch, partitions = Seq(("v", "identity"))))
    assert(p.getMessage.contains("partition source"), p.getMessage)
    val s = intercept[IllegalArgumentException](IcebergWriter.createTable(
      spark, fresh("graft_var_sort"), sch, sortOrder = Seq(("v", "asc"))))
    assert(s.getMessage.contains("sort key"), s.getMessage)
    val url = fresh("graft_var_eq")
    varTable(url)
    val e = intercept[IllegalArgumentException](IcebergWriter.upsert(
      spark, url, spark.sql("SELECT 1L AS k, parse_json('1') AS v"), Seq("v")))
    assert(e.getMessage.contains("equality"), e.getMessage)
  }

  test("v1/v2 tables refuse the variant type; v3 accepts it via addColumn") {
    val url = fresh("graft_variant_v2")
    val plain = StructType(Seq(StructField("k", LongType)))
    IcebergWriter.createTable(spark, url, plain)
    IcebergWriter.append(spark, url, Seq(1L, 2L).toDF("k").coalesce(1))
    val e = intercept[IllegalArgumentException](
      IcebergWriter.addColumn(spark, url, "v", "variant"))
    assert(e.getMessage.contains("v3"), e.getMessage)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.addColumn(spark, url, "v", "variant")
    val t = IcebergTable.load(spark, url)
    assert(t.schema("v").dataType == VariantType)
    // pre-add files read null for the new variant column
    val rows = t.read().select(col("k"), col("v").isNull.as("vn"))
      .as[(Long, Boolean)].collect().toSet
    assert(rows == Set((1L, true), (2L, true)))
  }
}
