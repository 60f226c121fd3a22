package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The write-path Catalyst transform expressions must agree bit-for-bit with
  * the metadata-plane [[Transforms]] evaluators (pruning correctness depends
  * on both sides computing identical partition values), and must execute
  * inside generated code (no UDF / CodegenFallback). */
class TransformExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").appName("graft-transform-expr-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("bucket expression matches Transforms.Bucket for longs") {
    import spark.implicits._
    val vals = Seq(0L, 1L, -1L, 34L, 1234567890123L, Long.MinValue + 1, Long.MaxValue)
    val got = vals.toDF("v").select(TransformExpr.bucket(col("v"), 16)).as[Int].collect()
    val want = vals.map(v => Transforms.Bucket(16)(v, "long").get.asInstanceOf[Long].toInt)
    assert(got.toSeq == want)
  }

  test("bucket expression matches Transforms.Bucket for strings") {
    import spark.implicits._
    val vals = Seq("", "a", "iceberg", "ümlaut-ünïcode", "x" * 1000)
    val got = vals.toDF("v").select(TransformExpr.bucket(col("v"), 7)).as[Int].collect()
    val want = vals.map(v => Transforms.Bucket(7)(v, "string").get.asInstanceOf[Long].toInt)
    assert(got.toSeq == want)
  }

  test("iceberg spec murmur vectors hold through the expression") {
    import spark.implicits._
    // public Iceberg spec appendix: bucket hash of int 34 = 2017239379
    val b = Seq(34L).toDF("v")
      .select(TransformExpr.bucket(col("v"), Int.MaxValue)).as[Int].head()
    assert(b == 2017239379 % Int.MaxValue)
  }

  test("time expressions match Transforms on epoch micros") {
    import spark.implicits._
    val micros = Seq(0L, 1L, -1L, 86400000000L - 1, 86400000000L,
      1700000000000000L, -86400000000L * 400)
    for (name <- Seq("year", "month", "day", "hour")) {
      val got = micros.toDF("v").select(TransformExpr.time(col("v"), name))
        .as[Int].collect()
      val want = micros.map(m =>
        Transforms.parse(name)(m, "timestamp").get.asInstanceOf[Long].toInt)
      assert(got.toSeq == want, s"transform $name")
    }
  }

  test("null values flow through as null") {
    import spark.implicits._
    val df = Seq[java.lang.Long](1L, null).toDF("v")
    val out = df.select(TransformExpr.bucket(col("v"), 4)).collect()
    assert(out(1).isNullAt(0))
  }

  test("expressions codegen (no CodegenFallback in the projection)") {
    // range source so ConvertToLocalRelation can't pre-evaluate the project
    val df = spark.range(4).select(TransformExpr.bucket(col("id"), 4),
      TransformExpr.time(col("id"), "day"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no WholeStageCodegen:\n$plan")
    assert(df.count() == 4)
  }
}
