package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergWriter, Pruning}

/** DSv2 aggregate pushdown: COUNT/MIN/MAX answered from MANIFEST metadata
  * through the standard SupportsPushDownAggregates contract — a plain
  * catalog `SELECT count(*) FROM cat.db.t` opens no data file and needs no
  * session extension. Complete pushdown only: anything inexact refuses and
  * Spark scans. */
class AggregatePushdownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def withTable(f: (String, String) => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_aggpd").toString
    val cat = s"ap${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/t"
    IcebergWriter.createTable(spark, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("cat",
          org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(spark, url,
      (1L to 500L).map(i => (i, i / 10.0, if (i % 50 == 0) null else s"c$i"))
        .toDF("k", "score", "cat").repartition(3))
    f(cat, url)
  }

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  test("count/min/max answer from metadata: LocalTableScan, exact values") {
    withTable { (cat, _) =>
      val q = s"SELECT count(*), count(cat), min(k), max(k), min(score), " +
        s"max(score) FROM $cat.db.t"
      val plan = planOf(q)
      assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
        s"aggregates must answer without a data scan:\n$plan")
      val r = spark.sql(q).head()
      assert(r.getLong(0) == 500L)
      assert(r.getLong(1) == 490L, "count(col) excludes nulls")
      assert(r.getLong(2) == 1L && r.getLong(3) == 500L)
      assert(r.getDouble(4) == 0.1 && r.getDouble(5) == 50.0)
    }
  }

  test("WHERE blocks the pushdown (residual-filter contract); result stays exact") {
    withTable { (cat, _) =>
      val q = s"SELECT count(*) FROM $cat.db.t WHERE k > 100"
      val plan = planOf(q)
      assert(plan.contains("BatchScan"), s"filtered aggregates must scan:\n$plan")
      assert(spark.sql(q).head().getLong(0) == 400L)
    }
  }

  test("min/max on strings refuse (writer-truncatable bounds); count(*) still pushes") {
    withTable { (cat, _) =>
      val plan = planOf(s"SELECT min(cat) FROM $cat.db.t")
      assert(plan.contains("BatchScan"), s"string min must scan:\n$plan")
      assert(planOf(s"SELECT count(*) FROM $cat.db.t").contains("LocalTableScan"))
    }
  }

  test("position deletes: count(*) stays pushed and exact; min/max refuse") {
    withTable { (cat, url) =>
      IcebergWriter.deleteRows(spark, url, Pruning.LtEq("k", 10L))
      val cq = s"SELECT count(*) FROM $cat.db.t"
      assert(planOf(cq).contains("LocalTableScan"),
        "position deletes subtract exactly — count(*) keeps answering")
      assert(spark.sql(cq).head().getLong(0) == 490L)
      val mq = s"SELECT min(k) FROM $cat.db.t"
      assert(planOf(mq).contains("BatchScan"),
        "a delete can remove the extremum — min must scan")
      assert(spark.sql(mq).head().getLong(0) == 11L)
    }
  }

  test("equality deletes: count(*) refuses too (0..n rows per key)") {
    withTable { (cat, url) =>
      IcebergWriter.equalityDelete(spark, url,
        Seq(Tuple1(7L)).toDF("k"), Seq("k"))
      val q = s"SELECT count(*) FROM $cat.db.t"
      assert(planOf(q).contains("BatchScan"), "eq deletes have no exact count")
      assert(spark.sql(q).head().getLong(0) == 499L)
    }
  }

  test("sum/avg/distinct are not metadata-answerable: full scan, exact") {
    withTable { (cat, _) =>
      val q = s"SELECT sum(k), count(DISTINCT cat) FROM $cat.db.t"
      assert(planOf(q).contains("BatchScan"))
      val r = spark.sql(q).head()
      assert(r.getLong(0) == 250L * 501L)
      assert(r.getLong(1) == 490L)
    }
  }
}
