package graft.iceberg

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution INSIDE nested structs (the reference rejects nested
  * types outright, conversions.py:46): add/rename/drop on dotted paths,
  * with field-id resolution at every nesting level. */
class NestedEvolutionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_nested").toString + "/tbl"

  val nested = StructType(Seq(
    StructField("k", LongType),
    StructField("meta", StructType(Seq(
      StructField("city", StringType),
      StructField("tag", StringType))))))

  private def sampleDf = {
    val rows = java.util.Arrays.asList(
      Row(1L, Row("nyc", "a")), Row(2L, Row("sfo", "b")))
    spark.createDataFrame(rows, nested)
  }

  test("nested struct round-trips with ids at every level") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, nested)
    val t0 = IcebergTable.load(spark, url)
    // pre-order id assignment: k=1, meta=2, meta.city=3, meta.tag=4
    assert(t0.metadata.properties != null)
    IcebergWriter.append(spark, url, sampleDf)
    val got = IcebergTable.load(spark, url).read()
      .select(col("k"), col("meta.city")).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "nyc"), (2L, "sfo")))
  }

  test("rename inside a struct keeps data via id resolution") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, nested)
    IcebergWriter.append(spark, url, sampleDf)
    IcebergWriter.renameColumn(spark, url, "meta.city", "town")
    val t = IcebergTable.load(spark, url)
    val metaType = t.schema("meta").dataType.asInstanceOf[StructType]
    assert(metaType.fieldNames.toSeq == Seq("town", "tag"))
    val got = t.read().select(col("k"), col("meta.town"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "nyc"), (2L, "sfo")),
      "data written under the old nested name must resolve by field id")
  }

  test("add and drop inside a struct; old files read null for added fields") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, nested)
    IcebergWriter.append(spark, url, sampleDf)
    IcebergWriter.addColumn(spark, url, "meta.zip", "string")
    val t1 = IcebergTable.load(spark, url)
    val metaType = t1.schema("meta").dataType.asInstanceOf[StructType]
    assert(metaType.fieldNames.toSeq == Seq("city", "tag", "zip"))
    assert(t1.read().filter(col("meta.zip").isNull).count() == 2)

    // new data lands in the evolved shape
    val evolved = StructType(Seq(
      StructField("k", LongType),
      StructField("meta", StructType(Seq(
        StructField("city", StringType),
        StructField("tag", StringType),
        StructField("zip", StringType))))))
    IcebergWriter.append(spark, url, spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, Row("chi", "c", "60601"))), evolved))
    assert(IcebergTable.load(spark, url).read()
      .filter(col("meta.zip").isNotNull).count() == 1)

    IcebergWriter.dropColumn(spark, url, "meta.tag")
    val t2 = IcebergTable.load(spark, url)
    assert(t2.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("city", "zip"))
    assert(t2.read().count() == 3)
    // time travel still sees the old shape
    assert(t2.snapshotRelative(-1).schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.contains("tag"))
  }

  test("nested structs survive the native SQL write path with ids intact") {
    val wh = java.nio.file.Files.createTempDirectory("graft_nestedsql").toString
    val url = s"$wh/db/n"
    IcebergWriter.createTable(spark, url, nested)
    val cat = s"ns${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"INSERT INTO $cat.db.n VALUES (1, named_struct('city', 'nyc', 'tag', 'a'))")
    spark.sql(s"INSERT INTO $cat.db.n VALUES (2, named_struct('city', 'sfo', 'tag', 'b'))")
    // nested rename resolves by the ids the NATIVE writer stamped
    IcebergWriter.renameColumn(spark, url, "meta.city", "town")
    val got = spark.sql(s"SELECT k, meta.town FROM $cat.db.n ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "nyc"), (2L, "sfo")),
      "nested ids from the native write must survive a rename")
  }

  test("fresh ids never collide after nested adds") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, nested)
    IcebergWriter.addColumn(spark, url, "meta.zip", "string")
    IcebergWriter.addColumn(spark, url, "score", "double")
    val t = IcebergTable.load(spark, url)
    // top-level ids + nested ids + 2 added: all distinct
    def allIds(node: com.fasterxml.jackson.databind.JsonNode): Seq[Int] = {
      val fs = node.get("fields")
      (0 until fs.size).flatMap { i =>
        val f = fs.get(i)
        f.get("id").asInt +: (if (f.get("type").isObject &&
          f.get("type").get("type").asText == "struct") allIds(f.get("type")) else Nil)
      }
    }
    val ids = t.iceSchema.fields.flatMap(f =>
      f.id +: (if (f.typeNode.isObject && f.typeNode.get("type").asText == "struct")
        allIds(f.typeNode) else Nil))
    assert(ids.distinct.size == ids.size, s"duplicate ids: $ids")
  }
}
