package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("salted join result equals the plain join") {
    // 90% of fact rows share one hot key
    val fact = (1L to 1000L).map(i =>
      (if (i % 10 == 0) i % 7 else 42L, i, s"p$i")).toDF("k", "row_id", "payload")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k"))
      .select("k", "row_id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "row_id", buckets = 8)
      .select("k", "row_id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("salt actually spreads the hot key across buckets") {
    val fact = (1L to 100L).map(i => (42L, i)).toDF("k", "row_id")
    import org.apache.spark.sql.functions._
    val salts = fact.withColumn("__salt",
        pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 4) // hot key occupies most of the 8 buckets
  }
}
