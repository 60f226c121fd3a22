package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}

/** Embedding cluster-balanced sampling ([[Corpus.clusterBalance]]): the
  * two-pass bin selection must equal the naive exact per-cluster top-N,
  * sign-bit bucketing, under-full clusters, and null vectors. */
class ClusterBalanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Deterministic pseudo-random vectors (no RNG state in the test). */
  private def vec(id: Long, dims: Int): Array[Float] =
    Array.tabulate(dims)(d =>
      (((id * 2654435761L + d * 40503L) % 1001L) - 500L).toFloat / 500f)

  test("two-pass selection equals the naive exact per-cluster top-N") {
    val df = (0L until 500L).map(i => (i, vec(i, 8))).toDF("id", "v")
    val got = Corpus.clusterBalance(df, "v", "id",
      perBucket = 7, bits = 3, bins = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // naive: same cluster + u, ranked with one window per cluster
    val cluster = (0 until 3).map(i =>
      when(element_at(col("v"), i + 1) >= lit(0f), lit(1L << i))
        .otherwise(lit(0L))).reduce(_ + _)
    val u = (TF.rollingFingerprint(col("id").cast("string")) *
      lit(2654435761L)) % lit(1000000007L)
    val naive = df.select(col("id"), cluster.as("cluster"), u.as("u"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster").orderBy(col("u"), col("id"))))
      .filter(col("rn") <= 7)
      .select("id", "cluster").orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got == naive)
    assert(got.groupBy(_._2).values.forall(_.size <= 7))
  }

  test("clusters smaller than perBucket keep every member") {
    val df = (0L until 20L).map(i => (i, vec(i, 8))).toDF("id", "v")
    val got = Corpus.clusterBalance(df, "v", "id",
      perBucket = 1000, bits = 2, bins = 8)
    assert(got.count() == 20)
  }

  test("cluster id is the little-endian sign pattern of the lead dims") {
    val df = Seq(
      (1L, Array(1f, 1f)), (2L, Array(-1f, 1f)),
      (3L, Array(1f, -1f)), (4L, Array(-1f, -1f)),
      (5L, Array(0f, -0f))).toDF("id", "v") // zeros count as non-negative
    val got = Corpus.clusterBalance(df, "v", "id", perBucket = 10, bits = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 0L), (5L, 3L)))
  }

  test("null vectors land deterministically in cluster 0") {
    val df = Seq((1L, Array(1f, 1f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val got = Corpus.clusterBalance(df, "v", "id", perBucket = 10, bits = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 0L)))
  }
}
