package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Scan-efficiency guard: the headline relational queries must keep their
  * filters PUSHED to the parquet scan and their read schemas PRUNED to the
  * referenced columns. At 100 TB a scan that reads all 16 lineitem columns
  * for a 4-column aggregate, or re-filters rows the footer stats could have
  * skipped, is the difference between minutes and hours — so a regression
  * in plan shape fails CI here, not in a cluster bill. */
class PushdownGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q06: every filter reaches the parquet scan as a pushed predicate") {
    val plan = formatted("q06_forecast_revenue")
    assert(plan.contains("PushedFilters:"), s"no pushdown section:\n$plan")
    // all three filter columns appear INSIDE the pushed-filter list
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters:")).mkString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(pushed.contains(c), s"$c not pushed: $pushed"))
  }

  test("q06: read schema prunes to the referenced columns only") {
    val plan = formatted("q06_forecast_revenue")
    val read = plan.linesIterator.filter(_.contains("ReadSchema:")).mkString
    Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .foreach(c => assert(read.contains(c), s"$c missing from scan: $read"))
    // a 16-column table must NOT be read whole for a 4-column aggregate
    Seq("l_comment", "l_orderkey", "l_partkey").foreach(c =>
      assert(!read.contains(c), s"unreferenced $c read by the scan: $read"))
  }

  test("q02: projection pushdown narrows the scan; filter pushes") {
    val plan = formatted("q02_filter_project")
    val read = plan.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(!read.contains("l_comment"),
      s"projection must prune unreferenced columns: $read")
    assert(plan.linesIterator.filter(_.contains("PushedFilters:"))
      .mkString.length > "PushedFilters: []".length,
      "q02's filter must reach the scan")
  }

  test("q05: the dimension joins broadcast — no shuffle of nation/region") {
    val df = SparkEntry.queries("q05_nation_revenue")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"small dimensions must broadcast:\n$plan")
  }

  test("q01: the aggregate runs partial-then-final (map-side combine " +
      "before the shuffle)") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregate:\n$plan")
    // two HashAggregate nodes = partial + final; a single one would ship
    // raw rows through the shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation before the exchange:\n$plan")
  }

  test("substring dedup touches the corpus at most three times (canon agg " +
      "+ join-back + rewrite pass), pruned to id + text") {
    // the spans pass consumes the window stream TWICE (agg side + join-back
    // side): that buys map-side partial aggregation on the fingerprint key —
    // the Zipf-head boilerplate span folds per input partition instead of
    // sorting in one straggler task — and an AQE-skew-splittable join. The
    // static plan still shows a scan per consumer; the RUNTIME reuse of the
    // id-keyed materialization exchange is pinned separately below.
    val plan = formatted("pipe_substring_clean")
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && !l.trim.startsWith("("))
    assert(scans <= 3, s"expected <= 3 corpus scans, got $scans:\n$plan")
    plan.linesIterator.filter(_.contains("ReadSchema:")).foreach(read =>
      Seq("lang", "source", "n_chars").foreach(c =>
        assert(!read.contains(c), s"unreferenced $c read by the scan: $read")))
  }

  test("substring dedup RUNTIME plan replays the window-fingerprint stream " +
      "from ONE exchange (agg build + join probe share the id-keyed " +
      "materialization; the corpus is scanned twice, not three times)") {
    // the r18 shape recomputed the fingerprint flatMap for the join probe —
    // a full extra corpus scan, a reproducible ~1.6× at sf0.1. The id-keyed
    // repartition below the fan-out is the materialization point; AQE stage
    // reuse must resolve the probe side to a ReusedExchange of it.
    val df = SparkEntry.queries("pipe_substring_clean")(spark, sfDir)
    df.collect() // finalize the adaptive plan — reuse is a RUNTIME property
    val p = df.queryExecution.executedPlan.toString
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      s"fingerprint materialization exchange not reused:\n$finalPlan")
    val scans = finalPlan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2,
      s"expected <= 2 runtime corpus scans (wins + rewrite), got $scans:\n$finalPlan")
  }

  test("substring spans: the fingerprint canonicalization is a PARTIAL-" +
      "then-final aggregation, never a ranking window (single-task sort " +
      "of the hottest span's occurrence list)") {
    val df = SparkEntry.queries("pipe_substring_spans")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("partial_first"),
      s"no map-side partial aggregation on the fingerprint key:\n$plan")
    // the per-fingerprint flagging must NOT be a window partitioned by the
    // fingerprint (the per-DOCUMENT island merge window is fine)
    val winOnFingerprint = plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("_h1"))
    assert(!winOnFingerprint,
      s"fingerprint flagging regressed to a ranking window:\n$plan")
  }

  test("bpe encode is a PURE PROJECTION: zero exchanges, one corpus scan " +
      "(the vocabulary rides in the task closure, not a join)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Corpus.bpeApplyMerges(docs, "text", "doc_id",
      Seq(("the", "cat"), ("a", "b")))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"tokenizer encode must not shuffle:\n$p")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected exactly one corpus scan, got $scans:\n$p")
  }

  test("hashed-linear classifier is ONE codegen'd projection: zero " +
      "exchanges, no UDF node, one corpus scan, and the scoring expression " +
      "runs INSIDE a whole-stage-codegen span (the interpreted-HOF form " +
      "this replaces evaluated outside codegen)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Corpus.hashedLinearScore(
      docs, "text", "doc_id", Array.tabulate(32)(_.toLong - 16))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"classifier must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF") &&
      !p.contains("MapElements"),
      s"classifier must be expression-only:\n$p")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected exactly one corpus scan, got $scans:\n$p")
    // the scoring Project must carry a codegen span marker (`*(n)`): a
    // CodegenFallback expression would print the Project bare
    val proj = p.linesIterator.find(_.contains("Project")).getOrElse("")
    assert("\\*\\(\\d+\\)".r.findFirstIn(proj).isDefined,
      s"classifier projection fell out of whole-stage codegen:\n$p")
  }

  test("fuzzy decontamination: equi-joins only (no cartesian), and the " +
      "benchmark-sized tables broadcast at runtime") {
    val df = SparkEntry.queries("pipe_decontam_fuzzy")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"fuzzy decontamination planned a product join:\n$p")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"benchmark-sized join sides must broadcast (AQE):\n$finalPlan")
  }

  test("cluster-balance touches the corpus exactly twice (census + probe) " +
      "and the census plan broadcasts") {
    val plan = formatted("pipe_cluster_mix")
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && !l.trim.startsWith("("))
    assert(scans <= 2, s"expected <= 2 scans (census + probe), got $scans:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"),
      s"the O(clusters x bins) census table must broadcast:\n$plan")
  }

  test("dedup family: canonical selection and bucket caps plan as " +
      "aggregations, never as an aggregate window over a content " +
      "fingerprint (the Zipf-head group would buffer in one task's sort)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shaped = Seq(
      "exactDedup" -> graft.operators.Dedup.exactDedup(docs, "text", "doc_id"),
      "minhashDedup" -> graft.operators.Dedup.minhashDedup(docs, "text", "doc_id"),
      "simhashPairs" -> graft.operators.Dedup.simhashPairs(docs, "text", "doc_id"),
      "incrementalDedup" -> graft.operators.Corpus.incrementalDedup(
        docs.limit(50), docs, "text", "doc_id"))
    shaped.foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"),
        s"$name regressed to a window over a corpus-keyed partition:\n$p")
      assert(p.contains("HashAggregate"),
        s"$name lost its aggregation-based group stats:\n$p")
    }
  }

  test("iceberg scan: the metadata plane plans only the stats-surviving " +
      "file subset (pruning gauge), not the whole live set") {
    // total live files first (its planning also writes the gauge, so the
    // filtered read runs LAST and owns the final gauge value). The gauge is
    // read PER TABLE ROOT, so planning of any other table between collect()
    // and get() cannot corrupt it.
    val total = SparkEntry.queries("ice_files")(spark, sfDir).count()
    assert(total >= 2, s"fixture must hold several live files, got $total")
    SparkEntry.queries("ice_read_filtered")(spark, sfDir).collect()
    val pruned = graft.iceberg.IcebergTable.lastPlanningFilesByRoot
      .getOrDefault(graft.IceQueries.FixtureDir, -1L)
    assert(pruned >= 1, "the filtered read must plan at least one file")
    assert(pruned < total,
      s"file-level stats pruning regressed: the age>30 scan planned all " +
        s"$total live files — at 100 TB that is a full metadata+data scan " +
        "for a selective predicate")
  }

  test("whole-stage codegen covers the q06 hot path") {
    val df = SparkEntry.queries("q06_forecast_revenue")(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val plan = df.queryExecution.executedPlan.toString
    // codegen spans render as `*(n)` prefixes in the tree string; both the
    // scan-side stage and the final aggregate stage must be covered
    val stages = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet
    assert(stages.size >= 2,
      s"scan+filter+aggregate must run inside whole-stage codegen " +
        s"(found spans: $stages):\n$plan")
  }
}
