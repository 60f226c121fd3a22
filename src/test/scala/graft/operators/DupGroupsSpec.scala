package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components resolution of near-dup pairs into groups. */
class DupGroupsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("chains, stars, and singleton edges resolve to min-id components") {
    // components: {1,2,3,4} (a chain), {10,11,12} (a star), {20,21}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), // chain with mixed edge direction
      (10L, 11L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.dupGroups(pairs).as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a long path converges within the iteration bound") {
    // path 0-1-2-…-12: min label must propagate the full diameter
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.dupGroups(pairs, maxIter = 20).as[(Long, Long)]
      .collect().toMap
    assert(got.size == 13 && got.values.forall(_ == 0L))
  }
}
