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

  test("bench regression detector fires on a pinned 2x-slower baseline") {
    // Round-13 ask: BENCH_r12 recorded a min 1.65x over the r11 baseline
    // yet reported "regressions":[] because baseline resolution silently
    // found nothing. This pins the whole chain: a baseline FILE resolves
    // (explicitly and by dir scan), parses, and a synthetic 2x slowdown
    // produces a non-empty regressions list.
    val dir = Files.createTempDirectory("benchspec")
    val f = dir.resolve("BENCH_r98.json")
    Files.writeString(f,
      """{"metric":"total","queries":{"q_a":0.3,"q_b":0.3},""" +
        """"queries_min":{"q_a":0.20,"q_b":0.30}}""")

    // explicit path wins
    val (pExp, mExp, _) = Bench.loadBaseline(Nil, Some(f.toString))
    assert(pExp.contains(f.toString) && mExp == Map("q_a" -> 0.20, "q_b" -> 0.30))
    // dir scan resolves the NEWEST BENCH_r*.json
    Files.writeString(dir.resolve("BENCH_r97.json"),
      """{"queries_min":{"q_a":9.9}}""")
    val (pScan, mScan, _) = Bench.loadBaseline(Seq(dir.toFile), None)
    assert(pScan.exists(_.endsWith("BENCH_r98.json")), s"resolved: $pScan")
    assert(mScan("q_a") == 0.20)
    // nothing to compare against is EXPLICIT (ships as "baseline":null)
    val (pNone, mNone, _) = Bench.loadBaseline(
      Seq(Files.createTempDirectory("benchspec_empty").toFile), None)
    assert(pNone.isEmpty && mNone.isEmpty)

    // the DRIVER's wrapper shape {"n","rc",...,"parsed":{...}} must parse
    // too — r12's silent non-detection was queries_min hiding under
    // "parsed" while the loader looked only at the top level
    val wrapped = dir.resolve("BENCH_r99.json")
    Files.writeString(wrapped,
      """{"n":12,"rc":0,"cpus":32,"sf":0.1,"tail":"...","parsed":{""" +
        """"queries_min":{"q_a":0.20,"q_b":0.30}}}""")
    val (pWrap, mWrap, sfWrap) = Bench.loadBaseline(Seq(dir.toFile), None)
    assert(pWrap.exists(_.endsWith("BENCH_r99.json")))
    assert(mWrap == Map("q_a" -> 0.20, "q_b" -> 0.30),
      s"driver-wrapped baseline must parse: $mWrap")
    // sf travels out so main can refuse cross-SF comparison
    assert(sfWrap.contains(0.1), s"baseline sf must parse: $sfWrap")
    assert(Bench.sfNumber("/root/testdata/sf0.001").contains(0.001))
    // ...and the driver's PARSE-FAILED shape ("parsed":null, line buried in
    // "tail" behind stderr noise) — the actual on-disk form of BENCH_r12
    val tailOnly = dir.resolve("BENCH_r99.json") // overwrite newest
    Files.writeString(tailOnly,
      """{"n":12,"rc":0,"parsed":null,"tail":"WARN blas noise\n[info] """ +
        """{\"metric\":\"total\",\"queries_min\":{\"q_a\":0.20,\"q_b\":0.30}}"}""")
    val (_, mTail, _) = Bench.loadBaseline(Seq(dir.toFile), None)
    assert(mTail == Map("q_a" -> 0.20, "q_b" -> 0.30),
      s"tail-buried baseline must parse: $mTail")
    // ...and the TRUNCATED-tail shape: the driver keeps only the line's
    // last chars, so the {"metric" head is gone but "queries_min" survives
    // mid-string — BENCH_r17's actual on-disk form; without recovery the
    // detector silently compares nothing (the r12 bug one layer deeper)
    Files.writeString(tailOnly,
      """{"n":17,"rc":0,"sf":0.1,"parsed":null,"tail":""" +
        """"\"q_x\":0.5,\"queries_min\":{\"q_a\":0.20,\"q_b\":0.30},""" +
        """\"baseline\":null"}""")
    val (_, mTrunc, sfTrunc) = Bench.loadBaseline(Seq(dir.toFile), None)
    assert(mTrunc == Map("q_a" -> 0.20, "q_b" -> 0.30),
      s"truncated-tail baseline must parse: $mTrunc")
    assert(sfTrunc.contains(0.1), "wrapper-level sf must still travel out")

    // synthetic 2x slowdown on q_a fires; q_b at baseline stays quiet
    val regs = Bench.detectRegressions(
      Seq("q_a" -> 0.40, "q_b" -> 0.31), mScan)
    assert(regs == Seq("q_a"), s"detector must flag the 2x entry: $regs")
    // at exactly the 1.5x threshold nothing fires (strict >)
    assert(Bench.detectRegressions(Seq("q_a" -> 0.30), mScan).isEmpty)
    // a zero baseline min (failed baseline run) never flags
    assert(Bench.detectRegressions(
      Seq("q_z" -> 5.0), Map("q_z" -> 0.0)).isEmpty)
  }

  test("compact bench line fits the driver's 2000-char stdout tail and parses") {
    // Round-22 ask (VERDICT #1): PERF_r01–r21 all came back empty because
    // the one-line JSON outgrew the driver wrapper's 2000-char tail. The
    // compact line must stay under budget WITH the real benchQueries name
    // set (plus slack for the sbt "[success]" trailer the tail also eats).
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val names = SparkEntry.benchQueries
    val results = names.map(n => (n, 0.5, 0.45, 0.1, None: Option[String]))
    val line = Bench.compactLine(results, 0, false, "/root/testdata/sf0.1")
    assert(line.length <= 1890, s"compact line ${line.length} chars")
    val j = mapper.readTree(line)
    assert(j.get("metric").asText == "total" && j.get("unit").asText == "sec")
    assert(j.get("queries").size == names.size, "per-query medians present")
    assert(j.get("queries_min").size == names.size, "per-query mins present")
    assert(j.get("sf").asText.contains("sf0.1"))
    // realistic worst case (entries up to single-digit seconds, failure +
    // unparsed-baseline flags live) keeps the mins object under budget
    val big = names.map(n => (n, 9.345, 8.111, 0.999, None: Option[String]))
    val bigLine = Bench.compactLine(big, 2, true, "/root/testdata/sf0.1")
    assert(bigLine.length <= 1890 && bigLine.contains("queries_min"),
      s"realistic worst-case line ${bigLine.length} chars")
    // pathological widths (EVERY entry >= 10 s) shed the mins object but
    // still fit — the driver always gets a parseable line
    val path = names.map(n => (n, 12.345, 11.111, 9.999, None: Option[String]))
    val pathLine = Bench.compactLine(path, 2, true, "/root/testdata/sf0.1")
    assert(pathLine.length <= 1890 && mapper.readTree(pathLine).has("queries"))
    // over budget (a future much larger entry set): mins drop, medians and
    // the rest stay — the line NEVER overflows the tail
    val many = (1 to 120).map(i =>
      (f"synthetic_query_name_$i%03d", 0.5, 0.4, 0.0, None: Option[String]))
    val l2 = Bench.compactLine(many, 0, false, "sf0.1")
    assert(!l2.contains("queries_min") && mapper.readTree(l2).has("queries"))
  }

  test("loadBaseline prefers a same-sf-same-cores BENCH_LOCAL file and " +
      "skips zero-comparable candidates") {
    // Round-22 ask (VERDICT #2 of 'what's wrong'): BENCH_r20's driver tail
    // truncates before the queries_min label, so the r21 gate compared
    // against NOTHING and reported drift 1.0000 vacuously. Unparseable
    // candidates must now be skipped in favor of the next-newest, and a
    // local full-fidelity file must win outright.
    val dir = Files.createTempDirectory("benchlocal")
    Files.writeString(dir.resolve("BENCH_r50.json"),
      """{"n":50,"rc":0,"parsed":null,"tail":"truncated, no label here"}""")
    Files.writeString(dir.resolve("BENCH_r49.json"),
      """{"queries_min":{"q_a":0.5}}""")
    val (p1, m1, _) = Bench.loadBaseline(Seq(dir.toFile), None)
    assert(p1.exists(_.endsWith("BENCH_r49.json")), s"skip unparseable: $p1")
    assert(m1 == Map("q_a" -> 0.5))
    // the local sidecar outranks every BENCH_r*.json
    Files.writeString(dir.resolve("BENCH_LOCAL_sf0.1_c32.json"),
      """{"queries_min":{"q_a":0.7},"sf":"/root/testdata/sf0.1"}""")
    val (p2, m2, sf2) = Bench.loadBaseline(Seq(dir.toFile), None,
      Some("BENCH_LOCAL_sf0.1_c32.json"))
    assert(p2.exists(_.endsWith("BENCH_LOCAL_sf0.1_c32.json")))
    assert(m2 == Map("q_a" -> 0.7) && sf2.contains(0.1))
    // nothing parseable at all: the path still reports (so main warns
    // loudly instead of silently comparing nothing) with an empty map
    val dir2 = Files.createTempDirectory("benchlocal2")
    Files.writeString(dir2.resolve("BENCH_r50.json"),
      """{"parsed":null,"tail":"nothing"}""")
    val (p3, m3, _) = Bench.loadBaseline(Seq(dir2.toFile), None)
    assert(p3.nonEmpty && m3.isEmpty, "unparsed baseline must surface")
    // core-count-mismatched candidates are skipped: an 8-core scaling run
    // must never gate against 32-core mins (a same-core older file wins)
    val dir3 = Files.createTempDirectory("benchlocal3")
    Files.writeString(dir3.resolve("BENCH_r51.json"),
      """{"n":51,"cpus":32,"sf":0.1,"parsed":{"queries_min":{"q_a":0.2}}}""")
    Files.writeString(dir3.resolve("BENCH_r50.json"),
      """{"n":50,"cpus":8,"sf":0.1,"parsed":{"queries_min":{"q_a":0.6}}}""")
    val (p4, m4, _) = Bench.loadBaseline(Seq(dir3.toFile), None, None, Some("8"))
    assert(p4.exists(_.endsWith("BENCH_r50.json")) && m4 == Map("q_a" -> 0.6),
      s"must skip the 32-core newest and take the 8-core: $p4 $m4")
    // no core count recorded (legacy artifact): still comparable
    val (p5, m5, _) = Bench.loadBaseline(Seq(dir.toFile), None, None, Some("8"))
    assert(p5.nonEmpty && m5.nonEmpty, "legacy cpu-less baselines still load")
  }

  test("regression gate normalizes run-level drift: a uniformly-scaled " +
      "run never flags, a single-query spike still does") {
    // Round-19 ask: the driver artifact flagged ice_stats_build at 1.54x
    // purely from a noisy machine window (the file had zero commits that
    // round; a quiet rerun measured 1.11x). The gate now divides out the
    // run's ambient drift — the lower-median per-query ratio — before
    // applying the 1.5x factor.
    val base = Map("q_a" -> 0.20, "q_b" -> 0.30, "q_c" -> 0.40, "q_d" -> 0.50)
    // the whole run 1.8x slower (noisy host): ambient, zero flags
    val uniform = base.toSeq.map { case (k, v) => k -> v * 1.8 }
    assert(Bench.detectRegressions(uniform, base).isEmpty,
      "a uniformly-scaled run is machine noise, not a regression")
    // one query 2x, the rest at baseline: the spike still flags
    val spike = Seq("q_a" -> 0.40, "q_b" -> 0.31, "q_c" -> 0.41, "q_d" -> 0.52)
    assert(Bench.detectRegressions(spike, base) == Seq("q_a"))
    // a spike ON TOP of uniform drift flags too (ratio 3.0 vs drift 1.5)
    val both = Seq("q_a" -> 0.60, "q_b" -> 0.45, "q_c" -> 0.60, "q_d" -> 0.75)
    assert(Bench.detectRegressions(both, base) == Seq("q_a"))
    // a faster-than-baseline run never TIGHTENS the gate (scale clamps at
    // 1): 1.4x on q_a is below the 1.5 factor even though the rest ran 0.7x
    val fast = Seq("q_a" -> 0.28, "q_b" -> 0.21, "q_c" -> 0.28, "q_d" -> 0.35)
    assert(Bench.detectRegressions(fast, base).isEmpty)
    // below 3 comparable queries there is no drift population: raw factor
    assert(Bench.detectRegressions(
      Seq("q_a" -> 0.40, "q_b" -> 0.31), base) == Seq("q_a"))
  }
}
