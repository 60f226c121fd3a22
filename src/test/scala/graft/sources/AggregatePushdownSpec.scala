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

  lazy val spark: SparkSession = {
    // own the session: an earlier suite may have left an EXTENSIONS-bearing
    // session as the default, whose Catalyst metadata-agg rule would answer
    // the aggregates this spec asserts the DSv2 path must answer (or refuse)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
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

  /** An identity-partitioned two-level table: region (string, with a null
    * partition) × bucket(4, k) — group-by pushdown must serve `region`
    * and refuse `k`. */
  private def withPartitioned(f: (String, String) => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_aggpdp").toString
    val cat = s"app${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/p"
    IcebergWriter.createTable(spark, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("region",
          org.apache.spark.sql.types.StringType))),
      partitions = Seq("region" -> "identity", "k" -> "bucket[4]"))
    IcebergWriter.append(spark, url,
      (1L to 300L).map(i => (i, i / 10.0,
        if (i % 3 == 0) null else s"r${i % 2}"))
        .toDF("k", "score", "region").repartition(3))
    f(cat, url)
  }

  test("GROUP BY identity partition column answers from metadata per group") {
    withPartitioned { (cat, _) =>
      val q = s"SELECT region, count(*) AS n, count(score) AS ns, " +
        s"min(k) AS lo, max(k) AS hi FROM $cat.db.p GROUP BY region"
      val plan = planOf(q)
      assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
        s"identity-partition group-by must answer without a data scan:\n$plan")
      val got = spark.sql(q).collect()
        .map(r => (Option(r.getString(0)).getOrElse("∅"), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
      // recompute from the raw rows (nulls every i%3==0; r0/r1 alternate)
      val rows = (1L to 300L).map(i =>
        (if (i % 3 == 0) "∅" else s"r${i % 2}", i))
      val want = rows.groupBy(_._1).toSeq.map { case (g, vs) =>
        (g, vs.size.toLong, vs.size.toLong, vs.map(_._2).min, vs.map(_._2).max)
      }.sortBy(_._1)
      assert(got.toSeq == want, s"got ${got.mkString(",")}")
    }
  }

  test("GROUP BY non-identity (bucket) or non-partition columns refuses") {
    withPartitioned { (cat, _) =>
      assert(planOf(s"SELECT k, count(*) FROM $cat.db.p GROUP BY k")
        .contains("BatchScan"), "bucket-partitioned key mixes values — scan")
      assert(planOf(s"SELECT score, count(*) FROM $cat.db.p GROUP BY score")
        .contains("BatchScan"), "non-partition key — scan")
    }
  }

  test("GROUP BY with row-level deletes refuses; result stays exact") {
    withPartitioned { (cat, url) =>
      IcebergWriter.deleteRows(spark, url, Pruning.LtEq("k", 30L))
      val q = s"SELECT region, count(*) AS n FROM $cat.db.p GROUP BY region"
      assert(planOf(q).contains("BatchScan"),
        "a delete can remove rows from any group — must scan")
      assert(spark.sql(q).collect().map(_.getLong(1)).sum == 270L)
    }
  }

  test("files predating the partition field (spec evolution) refuse the group-by") {
    val wh = java.nio.file.Files.createTempDirectory("graft_aggpde").toString
    val cat = s"ape${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/e"
    IcebergWriter.createTable(spark, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("region",
          org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(spark, url,
      Seq((1L, "a"), (2L, "b")).toDF("k", "region"))
    IcebergWriter.updatePartitionSpec(spark, url, Seq("region" -> "identity"))
    IcebergWriter.append(spark, url,
      Seq((3L, "a"), (4L, "c")).toDF("k", "region"))
    val q = s"SELECT region, count(*) FROM $cat.db.e GROUP BY region"
    assert(planOf(q).contains("BatchScan"),
      "pre-spec files have no partition value for the group key — scan")
    assert(spark.sql(q).collect().map(_.getLong(1)).sum == 4L)
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

  test("a row-bearing imported file with NO column stats forces refusal: " +
      "absence is unknown, not empty (the r14 wrong-answer path)") {
    withTable { (cat, url) =>
      // write an Avro data file holding the TRUE min of k — Avro has no
      // footer statistics, so the file registers with valueCounts = empty
      val avroSchema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"t","fields":[
          |{"name":"k","type":"long"},
          |{"name":"score","type":["null","double"],"default":null},
          |{"name":"cat","type":["null","string"],"default":null}]}"""
          .stripMargin)
      val wh = new java.io.File(url).getParentFile.getParent
      val af = new java.io.File(s"$wh/ext.avro")
      val w = new org.apache.avro.file.DataFileWriter[
        org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      w.create(avroSchema, af)
      val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
      rec.put("k", -5L)
      rec.put("score", -1.5)
      rec.put("cat", "zzz")
      w.append(rec)
      w.close()
      IcebergWriter.addFiles(spark, url, Seq(af.getAbsolutePath), "avro")
      // min/max and count(col) must all REFUSE (scan) — excluding the
      // stats-less file would answer min(k)=1, silently dropping -5
      val mq = s"SELECT min(k), max(k), min(score) FROM $cat.db.t"
      assert(planOf(mq).contains("BatchScan"),
        "min/max over a stats-less file must scan")
      val r = spark.sql(mq).head()
      assert(r.getLong(0) == -5L && r.getLong(1) == 500L &&
        r.getDouble(2) == -1.5)
      assert(planOf(s"SELECT count(cat) FROM $cat.db.t").contains("BatchScan"),
        "count(col) over a file without value_counts must scan")
      // count(*) still pushes: record counts are always present
      val cq = s"SELECT count(*) FROM $cat.db.t"
      assert(planOf(cq).contains("LocalTableScan"))
      assert(spark.sql(cq).head().getLong(0) == 501L)
    }
  }

  test("ORC imports carry harvested footer stats: min/max/count push down " +
      "over a table of foreign ORC files") {
    val wh = java.nio.file.Files.createTempDirectory("graft_aggorc").toString
    val cat = s"ao${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/o"
    val ext = s"$wh/ext"
    (1L to 300L).map(i => (i, i / 4.0, s"s$i")).toDF("k", "score", "name")
      .repartition(2).write.orc(ext)
    IcebergWriter.createTable(spark, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType))))
    val parts = new java.io.File(ext).listFiles()
      .filter(_.getName.endsWith(".orc")).map(_.getAbsolutePath).toSeq.sorted
    IcebergWriter.addFiles(spark, url, parts, "orc")
    // int/long bounds harvested from ORC tails are exact → min/max and
    // count(col) answer from metadata like natively written parquet
    val q = s"SELECT min(k), max(k), count(k), count(*) FROM $cat.db.o"
    val plan = planOf(q)
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"ORC-import stats must serve the metadata answer:\n$plan")
    val r = spark.sql(q).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 300L &&
      r.getLong(2) == 300L && r.getLong(3) == 300L)
    // float/double bounds from a FOREIGN writer carry no NaN-free claim —
    // min(score) must refuse (scan) yet stay correct
    val fq = s"SELECT min(score) FROM $cat.db.o"
    assert(planOf(fq).contains("BatchScan"),
      "foreign double bounds are inert without a NaN-free proof")
    assert(spark.sql(fq).head().getDouble(0) == 0.25)
  }

  test("answerFromMetadata memoizes between supportCompletePushDown and " +
      "pushAggregation: the O(files) bound decode runs once per plan") {
    withTable { (cat, _) =>
      GraftIcebergScanBuilderProbe.reset()
      val q = s"SELECT min(k), max(k), count(*) FROM $cat.db.t"
      assert(planOf(q).contains("LocalTableScan"))
      val runs = GraftIcebergScanBuilderProbe.lastDecodeRuns
      assert(runs == 1, s"metadata answer computed $runs times for one plan")
    }
  }
}
