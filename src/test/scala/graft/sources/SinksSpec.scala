package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink round-trips beyond parquet: the relational surface must read
  * and write every built-in format (SURVEY §2B scans/sinks row). */
class SinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString + "/out"

  lazy val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    .toDF("id", "s", "v")

  test("parquet round-trip") {
    val p = tmp("parquet")
    df.write.parquet(p)
    assert(spark.read.parquet(p).orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("orc round-trip") {
    val p = tmp("orc")
    df.write.orc(p)
    assert(spark.read.orc(p).count() == 3)
  }

  test("csv round-trip with header") {
    val p = tmp("csv")
    df.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(p)
    assert(back.columns.toSeq == Seq("id", "s", "v"))
    assert(back.count() == 3)
  }

  test("json round-trip") {
    val p = tmp("json")
    df.write.json(p)
    assert(spark.read.json(p).count() == 3)
  }

  // NOTE: the spark-avro connector jar is not in /opt/spark/jars (only Avro
  // core, which our Iceberg manifest reader uses) — avro as a DataFrame
  // source/sink is unavailable in this environment.

  test("partitioned parquet write prunes partitions on read") {
    val p = tmp("part")
    df.write.partitionBy("s").parquet(p)
    val pruned = spark.read.parquet(p).filter($"s" === "b")
    assert(pruned.count() == 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || pruned.inputFiles.length <= 1)
  }
}
