package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergWriter

/** STORAGE-PARTITIONED JOINS: two Iceberg tables partitioned the same way
  * join with zero shuffle — the scan reports KeyGroupedPartitioning and
  * plans one input partition per partition value. The decisive plan shape
  * at 100 TB: no network-wide exchange of either fact table. */
class StoragePartitionedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  /** Run `f` with storage-partitioned-join confs on (and broadcast + AQE
    * off so the plan shape is deterministic), restoring after. */
  private def withSpjConf(extra: (String, String)*)(f: => Unit): Unit = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.graft.iceberg.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") ++ extra
    val before = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType),
    StructField("v", LongType)))

  private def writeTable(url: String, partitions: Seq[(String, String)],
      rows: Seq[(Long, String, Long)]): Unit = {
    IcebergWriter.createTable(spark, url, schema, partitions)
    IcebergWriter.append(spark, url, rows.toDF("k", "cat", "v"))
  }

  test("identity-partitioned tables join with zero shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spj_id").toString
    val cats = Seq("a", "b", "c", "d")
    val left = (1L to 200L).map(i => (i, cats((i % 4).toInt), i * 10))
    val right = (1L to 100L).map(i => (i, cats((i % 4).toInt), i * 7))
    writeTable(s"$dir/l", Seq("cat" -> "identity"), left)
    writeTable(s"$dir/r", Seq("cat" -> "identity"), right)

    def plan(): DataFrame = {
      val l = spark.read.format("graft-iceberg").load(s"$dir/l")
      val r = spark.read.format("graft-iceberg").load(s"$dir/r")
      l.join(r, "cat")
    }

    // expected row count: all (left, right) pairs within a cat
    val expected = cats.map(c =>
      left.count(_._2 == c).toLong * right.count(_._2 == c)).sum

    withSpjConf() {
      val df = plan()
      assert(df.collect().length.toLong == expected)
      assert(shuffleCount(df) == 0,
        s"join should be storage-partitioned:\n${df.queryExecution.executedPlan}")
    }
    // without the data-grouping opt-in: the join shuffles both sides
    withSpjConf("spark.graft.iceberg.preserveDataGrouping" -> "false") {
      assert(shuffleCount(plan()) == 2)
    }
  }

  test("bucket-partitioned tables join with zero shuffle through the catalog") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val tables = scala.collection.mutable.Map.empty[String, String]
    def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/v1/namespaces", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/namespaces")
      (ex.getRequestMethod, path.split("/").filter(_.nonEmpty).toList) match {
        case ("GET", ns :: "tables" :: t :: Nil) =>
          tables.get(s"$ns.$t") match {
            case Some(loc) =>
              val hint = new java.io.File(s"$loc/metadata/version-hint.text")
              val v = if (hint.exists()) scala.io.Source.fromFile(hint).mkString.trim else "1"
              reply(ex, 200, s"""{"metadata-location": "$loc/metadata/v$v.metadata.json"}""")
            case None => reply(ex, 404, """{"error": "no such table"}""")
          }
        case other => reply(ex, 400, s"""{"error": "unhandled $other"}""")
      }
    })
    server.start()
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_spj_bk").toString
      val left = (1L to 300L).map(i => (i % 50, s"c${i % 7}", i))
      val right = (1L to 150L).map(i => (i % 50, s"r${i % 5}", i * 3))
      writeTable(s"$dir/l", Seq("k" -> "bucket[4]"), left)
      writeTable(s"$dir/r", Seq("k" -> "bucket[4]"), right)
      tables("db.l") = s"$dir/l"
      tables("db.r") = s"$dir/r"

      val catName = s"spjcat${server.getAddress.getPort}"
      spark.conf.set(s"spark.sql.catalog.$catName", "graft.sources.GraftIcebergCatalog")
      spark.conf.set(s"spark.sql.catalog.$catName.uri",
        s"http://127.0.0.1:${server.getAddress.getPort}")

      withSpjConf() {
        val df = spark.sql(
          s"""SELECT l.k, l.v AS lv, r.v AS rv
             |FROM $catName.db.l l JOIN $catName.db.r r ON l.k = r.k""".stripMargin)
        val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
        val want = (for {
          (lk, _, lv) <- left; (rk, _, rv) <- right if lk == rk
        } yield (lk, lv, rv)).sorted
        assert(got.toSeq == want)
        assert(shuffleCount(df) == 0,
          s"bucket join should be storage-partitioned:\n${df.queryExecution.executedPlan}")
      }
    } finally server.stop(0)
  }

  test("the bucket catalog function is SQL-callable and matches the writer") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try {
      val catName = s"fncat${server.getAddress.getPort}"
      spark.conf.set(s"spark.sql.catalog.$catName", "graft.sources.GraftIcebergCatalog")
      spark.conf.set(s"spark.sql.catalog.$catName.uri",
        s"http://127.0.0.1:${server.getAddress.getPort}")
      val got = spark.sql(s"SELECT $catName.bucket(16, CAST(34 AS BIGINT))").head().getInt(0)
      assert(got == graft.iceberg.TransformEval.bucketLong(34L, 16))
      val s = spark.sql(s"SELECT $catName.bucket(16, 'iceberg')").head().getInt(0)
      assert(s == graft.iceberg.Transforms.Bucket(16)("iceberg", "string").get.asInstanceOf[Long].toInt)
    } finally server.stop(0)
  }
}
