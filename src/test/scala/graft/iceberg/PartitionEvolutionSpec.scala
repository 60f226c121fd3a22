package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Partition spec evolution ([[IcebergWriter.updatePartitionSpec]]):
  * metadata-only respec, mixed-spec reads with per-file pruning contexts,
  * and the guards around operations that assume one spec. */
class PartitionEvolutionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshTable: String =
    java.nio.file.Files.createTempDirectory("graft_ice_pev").toString + "/tbl"

  val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  test("evolve identity -> bucket: metadata, routing, and mixed-spec reads") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq(("cat", "identity")))
    IcebergWriter.append(spark, url,
      (1L to 40L).map(i => (i, s"c${i % 2}")).toDF("k", "cat"))
    IcebergWriter.updatePartitionSpec(spark, url, Seq(("k", "bucket[4]")))
    IcebergWriter.append(spark, url,
      (41L to 80L).map(i => (i, s"c${i % 2}")).toDF("k", "cat"))

    val t = IcebergTable.load(spark, url)
    assert(t.metadata.defaultSpecId == 1)
    assert(t.partitionSpec.fields.map(f => (f.name, f.transform)) ==
      Seq(("k_bucket", "bucket[4]")))
    // every row survives the respec
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq
      == (1L to 80L))
    // files carry their own spec id
    val bySpec = t.liveFiles().groupBy(_.specId.get)
    assert(bySpec.keySet == Set(0, 1))
    // partition-value pruning still bites on the OLD files: cat='c0' keeps
    // half of the spec-0 files, and pruning remains sound overall
    val pruned = t.prunedFiles(Pruning.Eq("cat", "c0"))
    assert(pruned.exists(_.specId.contains(0)))
    assert(bySpec(0).size > pruned.count(_.specId.contains(0)))
    assert(t.read(filters = Seq(Seq(("cat", "==", "c0"))))
      .as[(Long, String)].collect().map(_._1).sorted.toSeq
      == (1L to 80L).filter(_ % 2 == 0))
  }

  test("same-named field under a changed transform stays sound per file") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq(("k", "bucket[4]")))
    IcebergWriter.append(spark, url,
      (1L to 50L).map(i => (i, "a")).toDF("k", "cat"))
    IcebergWriter.updatePartitionSpec(spark, url, Seq(("k", "bucket[8]")))
    IcebergWriter.append(spark, url,
      (51L to 100L).map(i => (i, "b")).toDF("k", "cat"))

    val t = IcebergTable.load(spark, url)
    // both specs name the field k_bucket; each file must be evaluated under
    // ITS spec or bucket pruning would test bucket[8] values against
    // bucket[4] files and silently drop matching rows
    (1L to 100L).foreach { v =>
      val hit = t.read(filters = Seq(Seq(("k", "==", v))))
        .as[(Long, String)].collect().map(_._1).toSeq
      assert(hit == Seq(v), s"k=$v returned $hit")
    }
    // and the bucket tier still prunes (point query never scans all files)
    val all = t.liveFiles().size
    assert(t.prunedFiles(Pruning.Eq("k", 7L)).size < all)
  }

  test("field-id allocation: fresh ids advance, identical fields reuse") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq(("cat", "identity")))
    IcebergWriter.updatePartitionSpec(spark, url, Seq(("k", "bucket[4]")))
    // back to a spec containing the ORIGINAL field: its id must be reused
    IcebergWriter.updatePartitionSpec(spark, url,
      Seq(("cat", "identity"), ("k", "bucket[4]")))
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.defaultSpecId == 2)
    val spec2 = t.metadata.specById(2).fields.map(f => (f.name, f.fieldId))
    assert(spec2 == Seq(("cat", 1000), ("k_bucket", 1001)))
  }

  test("dynamic overwrite refuses mixed-spec tables") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq(("cat", "identity")))
    IcebergWriter.append(spark, url, Seq((1L, "a"), (2L, "b")).toDF("k", "cat"))
    IcebergWriter.updatePartitionSpec(spark, url, Seq(("k", "bucket[4]")))
    IcebergWriter.append(spark, url, Seq((3L, "a")).toDF("k", "cat"))
    val e = intercept[UnsupportedOperationException] {
      IcebergWriter.overwriteDynamic(spark, url, Seq((9L, "a")).toDF("k", "cat"))
    }
    assert(e.getMessage.contains("mixed-spec"))
    // compaction folds everything onto the current spec, unblocking it
    Maintenance.compact(spark, url, targetFiles = Some(1))
    val t = IcebergTable.load(spark, url)
    assert(t.liveFiles().forall(_.specId.contains(1)))
  }

  test("unknown source column or transform refuses") {
    val url = freshTable
    IcebergWriter.createTable(spark, url, schema)
    intercept[IllegalArgumentException] {
      IcebergWriter.updatePartitionSpec(spark, url, Seq(("nope", "identity")))
    }
    intercept[IllegalArgumentException] {
      IcebergWriter.updatePartitionSpec(spark, url, Seq(("k", "zigzag[3]")))
    }
  }
}
