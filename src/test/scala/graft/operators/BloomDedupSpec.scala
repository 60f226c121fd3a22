package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-prefiltered incremental dedup ([[Corpus.incrementalDedupBloom]]):
  * exact equivalence with the plain anti-join, no-false-negative routing
  * (every true duplicate lands in the suspect set), and within-batch
  * canonicalization. */
class BloomDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val history = Seq(
    (1L, "seen alpha"), (2L, "seen beta"), (3L, "seen gamma"))
    .toDF("id", "text")

  test("result equals the plain anti-join; duplicates route to suspects") {
    val inc = Seq(
      (10L, "novel one"), (11L, "seen beta"), // true duplicate
      (12L, "novel two"), (13L, "novel two"), // within-batch duplicate pair
      (14L, "seen alpha")) // true duplicate
      .toDF("id", "text")
    val (out, nNovel, nSuspect) =
      Corpus.incrementalDedupBloom(inc, history, "text", "id")
    val exact = Corpus.incrementalDedup(inc, history, "text", "id")
      .select("id").as[Long].collect().toSet
    val got = out.select("id").as[Long].collect().toSet
    assert(got == exact, s"bloom route must not change the result")
    assert(got == Set(10L, 12L), "novels kept, batch-dup canonicalized, " +
      "history duplicates dropped")
    // NO FALSE NEGATIVES: both true duplicates MUST be suspects; the two
    // novel texts may land either way (false positives allowed), so the
    // suspect count is bounded, never pinned. Canon = 4 docs (the
    // within-batch pair folds to its min id before routing).
    assert(nSuspect >= 2 && nNovel + nSuspect == 4,
      s"4 canon docs split novel=$nNovel suspects=$nSuspect")
  }

  test("an empty history makes everything certainly novel") {
    val inc = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val (out, nNovel, nSuspect) = Corpus.incrementalDedupBloom(
      inc, history.limit(0), "text", "id")
    assert(out.count() == 2 && nNovel == 2 && nSuspect == 0)
  }
}
