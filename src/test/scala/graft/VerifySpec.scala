package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for [[Verify.runOne]]'s tamper-proof failure record:
  * a throwing query leaves a `<name>._FAILED` marker; a succeeding rerun
  * into the same outDir REMOVES a stale marker (the advisor's round-10
  * finding: markers persisted across reruns, so a fixed query could still
  * read as failed). */
class VerifySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ok(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seq((1, "a")).toDF("id", "v")
  }

  private def boom(s: SparkSession, dir: String): DataFrame =
    sys.error("deliberate failure")

  test("failure writes a marker with the message; success removes a stale one") {
    val out = Files.createTempDirectory("verifyspec").toString
    val marker = Paths.get(s"$out/q._FAILED")

    assert(Verify.runOne(spark, "unused", out, "q", boom).nonEmpty)
    assert(Files.exists(marker), "marker missing after failure")
    assert(Files.readString(marker).contains("deliberate failure"))

    assert(Verify.runOne(spark, "unused", out, "q", ok).isEmpty)
    assert(!Files.exists(marker), "stale marker survived a green rerun")
    assert(Files.exists(Paths.get(s"$out/q/_SUCCESS")), "result parquet missing")
  }

  test("success never creates a marker") {
    val out = Files.createTempDirectory("verifyspec").toString
    assert(Verify.runOne(spark, "unused", out, "p", ok).isEmpty)
    assert(!Files.exists(Paths.get(s"$out/p._FAILED")))
  }
}
