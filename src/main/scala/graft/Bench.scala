package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver's BENCH_r{N}.json. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE's partition coalescer targets BYTES (1 MB minimum partition
      // size), but this pipeline's reduce stages are CPU-bound per row
      // (shingle/agg/join over short text rows) — at bench scale every
      // post-shuffle stage coalesced to ONE task, serializing the reduce
      // work on one core (measured: pipe_line_dedup 1.21 s → 0.97 s,
      // dd_minhash_lsh 2.5 s → 1.3 s with the floor lowered). At
      // production shuffle sizes partitions exceed 1 MB and this setting
      // is inert, so it is scale-safe; env-overridable for A/B runs.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "16k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // contract queries plus bench-only raw-operator bodies (_op entries)
    val benchable = SparkEntry.queries ++ SparkEntry.benchOnly
    val names = {
      val h = SparkEntry.benchQueries.filter(benchable.contains)
      val base = if (h.nonEmpty) h else SparkEntry.queries.keys.toSeq.sorted
      // local-iteration subset filter; NOT part of the driver contract (the
      // driver never sets it) — lets a change be re-timed without paying for
      // the full battery. Unset/empty = the full headline set, unchanged.
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.trim).filter(_.nonEmpty) match {
        case Some(f) =>
          val want = f.split(",").map(_.trim).filter(_.nonEmpty).toSet
          val sel = base.filter(want)
          // an all-unmatched filter would otherwise print total=0 with zero
          // queries and exit 0 — indistinguishable from a (fast) valid run
          if (sel.isEmpty) System.err.println(
            s"BENCH_ONLY WARNING: '$f' matched no benchable query names " +
              s"(benchable: ${base.mkString(", ")}) — empty run")
          sel
        case None => base
      }
    }
    // JVM/codegen warm-up on the smallest SF so measured times reflect
    // steady-state execution, not first-query classloading — then ONE
    // untimed rep of the first entry on the MEASURED sf: JIT tiering,
    // shuffle machinery and page-cache warm-up otherwise land in that
    // entry's samples (r11 saw q01's IQR jump 0.073 → 0.585 from exactly
    // this while its median and min stayed flat).
    names.headOption.foreach { n =>
      try benchable(n)(spark, s"${SparkEntry.testdataRoot}/sf0.001").count()
      catch { case _: Throwable => () }
      try benchable(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Per-query stats over `reps` runs: wall-clock on a shared VM swings
    // ±35% on identical code, so a single sample cannot distinguish a real
    // regression from noise. 5 reps; MEDIAN is the headline number, and the
    // per-query MIN + IQR ship alongside so a reader can separate a genuine
    // slowdown (min moved) from dispersion (IQR wide, min stable).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val results = names.map { name =>
      // untimed setup on the MEASURED sf (e.g. the IVF index build) so
      // rep 1 never pays one-off construction; teardown after the reps
      // releases any executor storage the setup pinned. A setup FAILURE
      // is the entry's failure: recording it (and skipping the reps)
      // keeps rep 1 from silently paying the build inside the timed body
      // with nothing in the JSON flagging it.
      val setupErr = SparkEntry.benchSetup.get(name).flatMap { f =>
        try { f(spark, sfDir); None }
        catch { case e: Throwable =>
          System.err.println(s"BENCH SETUP FAILURE in $name: $e")
          Some(("setup: " + e.toString).replaceAll("[\"\\\\\n]", " ").take(200))
        }
      }
      // per-entry session-conf overrides (SparkEntry.benchConf): applied
      // for the reps only, restored after, so entries never leak conf into
      // one another
      val overrides = SparkEntry.benchConf.getOrElse(name, Map.empty[String, String])
      val savedConf = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      val samples =
        if (setupErr.isDefined) Vector.empty[(Double, Option[String])]
        else (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          // noop sink executes the FULL plan (a count() would let Spark
          // prune projections and undercount the real work)
          val err =
            try { benchable(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save(); None }
            catch { case e: Throwable =>
              System.err.println(s"BENCH FAILURE in $name: $e")
              Some(e.toString.replaceAll("[\"\\\\\n]", " ").take(200)) }
          ((System.nanoTime() - t0) / 1e9, err)
        }
      savedConf.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      SparkEntry.benchTeardown.get(name).foreach { f =>
        try f(spark, sfDir) catch { case _: Throwable => () }
      }
      // failed reps return fast — including them would bias the stats low,
      // so only successful runs count toward the timing; 0.0 if none passed
      val ok = samples.collect { case (t, None) => t }.sorted
      def q(f: Double) = if (ok.isEmpty) 0.0
        else ok(math.min(ok.length - 1, (f * ok.length).toInt))
      val median = q(0.5)
      val minT = if (ok.isEmpty) 0.0 else ok.head
      val iqr = if (ok.length < 2) 0.0 else q(0.75) - q(0.25)
      (name, median, minT, iqr,
        setupErr.orElse(samples.flatMap(_._2).headOption))
    }
    // REGRESSION detection compares MINS (the least noisy statistic: the
    // best-of-N run is the closest observable to the true cost on an idle
    // machine) against the newest prior BENCH_r*.json when one is present.
    // The RESOLVED baseline path ships in the JSON line ("baseline") so a
    // reader can audit what was compared — BENCH_r12 recorded a >1.5× min
    // with "regressions":[] and nothing in the artifact explained why (the
    // runner's cwd held no BENCH_r*.json, so detection silently compared
    // against nothing). Fallback search roots: the repo root discovered by
    // walking up from cwd to the nearest .git, plus SPARK_GRAFT_REPO when
    // set — no machine-specific absolute path baked in.
    val repoRoot = Iterator.iterate(new java.io.File(".").getAbsoluteFile
        .getCanonicalFile)(_.getParentFile)
      .takeWhile(_ != null)
      .find(d => new java.io.File(d, ".git").exists())
    val searchDirs = (Seq(new java.io.File(".")) ++ repoRoot ++
      sys.env.get("SPARK_GRAFT_REPO").map(new java.io.File(_))).distinct
    // this run's own full-fidelity record (and the PREFERRED baseline for
    // the next same-sf-same-cores run): the driver wrapper keeps only the
    // stdout line's last 2000 chars, so a wrapper is a lossy baseline — a
    // BENCH_LOCAL file never truncates. Keyed by sf AND core count because
    // mins are not comparable across either.
    val localName = s"BENCH_LOCAL_sf${sfNumber(sfDir).getOrElse(0.0)}_c$cpus.json"
    val (baselinePath, baseline, baselineSf) = loadBaseline(
      searchDirs, sys.env.get("SPARK_GRAFT_BENCH_BASELINE"), Some(localName),
      Some(cpus))
    // a resolved baseline that yields ZERO comparable queries makes the
    // regression gate silently vacuous (the r12 bug, seen again in r21 when
    // the driver tail truncated before the queries_min label) — say so
    val baselineUnparsed = baselinePath.isDefined && baseline.isEmpty
    if (baselineUnparsed) System.err.println(
      s"BENCH BASELINE UNPARSED: ${baselinePath.get} yielded zero " +
        "comparable queries — the regression gate is BLIND this run")
    // an SF-mismatched baseline (a local sf0.001 iteration run against the
    // driver's sf0.1 artifact) would flag EVERY query — compare same-SF only
    val curSf = sfNumber(sfDir)
    val comparable = (baselineSf, curSf) match {
      case (Some(b), Some(c)) => math.abs(b - c) < 1e-9
      case _ => true // unknown on either side: compare (legacy artifacts)
    }
    val gateMins = results.collect { case (k, _, minT, _, None) => (k, minT) }
    val regressions = if (!comparable) Nil
      else detectRegressions(gateMins, baseline)
    // surface the run-level drift the gate normalizes away: a UNIFORM
    // slowdown produces zero per-query flags by design, so when the drift
    // itself crosses the flag factor, say so loudly — it is either a very
    // noisy host window or a global code/config regression, and only a
    // human rerun can tell the two apart.
    val drift = if (!comparable) 1.0 else driftScale(gateMins, baseline)
    if (drift > 1.5)
      System.err.println(f"BENCH DRIFT WARNING: the whole run is $drift%.2fx " +
        "the baseline (uniform drift is normalized away by the regression " +
        "gate; rerun on a quiet host or suspect a global regression)")
    if (regressions.nonEmpty)
      System.err.println(s"BENCH REGRESSION: ${regressions.mkString(", ")} " +
        s"exceed 1.5x the baseline min (${baselinePath.getOrElse("?")})")
    // A failed query must never read as a speedup: report per-query errors
    // and exit non-zero so the driver records the regression.
    def obj(f: ((String, Double, Double, Double, Option[String])) => String) =
      results.map(f).mkString("{", ",", "}")
    val qs = obj { case (k, v, _, _, _) => "\"" + k + "\":" + v }
    val mins = obj { case (k, _, m, _, _) => "\"" + k + "\":" + m }
    val iqrs = obj { case (k, _, _, i, _) => "\"" + k + "\":" + f3(i) }
    val errs = results.collect { case (k, _, _, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.count(_._5.nonEmpty)
    val regs = regressions.map("\"" + _ + "\"").mkString("[", ",", "]")
    val baseJson = baselinePath
      .map(p => "\"" + p.replaceAll("[\"\\\\]", "_") + "\"").getOrElse("null")
    val unparsedJson = if (baselineUnparsed) ",\"baseline_unparsed\":true" else ""
    // FULL-FIDELITY record (full-precision medians, mins, IQRs, errors,
    // baseline audit trail): persisted to the repo as BENCH_LOCAL_*.json —
    // it is the next run's regression baseline and the judge's audit file.
    // Numeric fields use Double.toString / Locale.ROOT formatting: a
    // comma-decimal default locale must never corrupt the JSON.
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","aggregation":"median_of_$reps","cpus":"$cpus","queries":$qs,"queries_min":$mins,"queries_iqr":$iqrs,"baseline":$baseJson$unparsedJson,"drift":${f4(drift)},"regression":${regressions.nonEmpty},"regressions":$regs,"failed":$failed,"errors":$errs,"sf":"$sfDir"}"""
    // subset runs (SPARK_GRAFT_BENCH_ONLY) never persist: a 3-query
    // sidecar would silently become the next full run's baseline and the
    // gate would compare almost nothing. Runs with FAILED queries never
    // persist either: a failed entry records min 0.0, which a zero-guard
    // in detectRegressions then treats as "nothing to compare" — the
    // query would be permanently un-gated.
    val subsetRun = sys.env.get("SPARK_GRAFT_BENCH_ONLY").exists(_.trim.nonEmpty)
    val sidecar = new java.io.File(repoRoot.getOrElse(new java.io.File(".")), localName)
    if (subsetRun) System.err.println(
      s"BENCH NOTE: subset run — not persisting $sidecar")
    else if (failed > 0) System.err.println(
      s"BENCH NOTE: $failed failed queries — not persisting $sidecar")
    else try java.nio.file.Files.writeString(sidecar.toPath, fullLine + "\n")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"BENCH WARNING: could not persist $sidecar: $e") }
    // COMPACT stdout line (the driver contract): the driver wrapper keeps
    // only the LAST ~2000 stdout chars, and every prior round's line outgrew
    // that tail, so PERF_r01–r21 all parsed null. 3-decimal medians + mins
    // fit in ~1900 chars for the current 36 entries; the length guard drops
    // the mins object first (the sidecar keeps full fidelity) rather than
    // ever emitting a line the driver cannot parse.
    val compact = compactLine(results, failed, baselineUnparsed, sfDir)
    // the guard sheds mins silently inside compactLine (a pure function);
    // say so here — losing the min statistic from the driver artifact is
    // exactly the silent-truncation class this rework exists to end
    if (!compact.contains("\"queries_min\"")) System.err.println(
      "BENCH NOTE: compact line over budget — queries_min shed from stdout " +
        "(full fidelity in the sidecar)")
    println(compact)
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  /** Locale-pinned fixed-point formatting: a comma-decimal JVM default
    * locale would emit `1,0000` and break every JSON consumer. */
  def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  def f4(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  /** The one-line stdout JSON, sized for the driver's 2000-char stdout
    * tail (minus the sbt "[success]" trailer the tail also eats): ONLY the
    * contract fields (metric/value/unit/queries/sf) plus 3-decimal mins
    * and the failure count — aggregation note, IQRs, drift, regressions
    * and errors live in the full-fidelity sidecar. Mins are dropped first
    * if a future entry set outgrows `maxLen`; medians never are. Factored
    * out of main so a spec can pin the length budget against the real
    * benchQueries name set. */
  def compactLine(results: Seq[(String, Double, Double, Double, Option[String])],
      failed: Int, baselineUnparsed: Boolean, sfDir: String,
      maxLen: Int = 1890): String = {
    def obj(f: ((String, Double, Double, Double, Option[String])) => String) =
      results.map(f).mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val qs = obj { case (k, v, _, _, _) => "\"" + k + "\":" + f3(v) }
    val mins = obj { case (k, _, m, _, _) => "\"" + k + "\":" + f3(m) }
    val unparsedJson = if (baselineUnparsed) ",\"baseline_unparsed\":true" else ""
    val head = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs"""
    val tail = s""","failed":$failed$unparsedJson,"sf":"$sfDir"}"""
    val withMins = head + s""","queries_min":$mins""" + tail
    if (withMins.length <= maxLen) withMins else head + tail
  }

  /** "sf0.1" etc. from a path or metric string → Some(0.1). */
  def sfNumber(s: String): Option[Double] =
    "sf([0-9.]+[0-9])".r.findFirstMatchIn(s)
      .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)

  /** Resolve the regression baseline: an explicit path wins; otherwise a
    * same-sf-same-cores `BENCH_LOCAL` file (full-fidelity, written by the
    * previous run — preferred because driver wrappers truncate the line to
    * a 2000-char tail); otherwise the newest `BENCH_r*.json` across
    * `searchDirs` (first dir with any hit wins — the runner's cwd, then
    * the repo home). Non-explicit candidates that parse to ZERO comparable
    * queries are SKIPPED (with a stderr note) in favor of the next-newest —
    * the r21 driver wrapper truncated before the `queries_min` label and
    * the gate silently compared against nothing. Returns the RESOLVED path
    * (None = nothing to compare against, which the JSON line records
    * explicitly), the per-query min seconds parsed from it, and the
    * baseline's scale factor when recorded. Factored out of main so a spec
    * can prove detection fires on a pinned baseline. */
  def loadBaseline(searchDirs: Seq[java.io.File], explicit: Option[String],
      localName: Option[String] = None, cpus: Option[String] = None)
      : (Option[String], Map[String, Double], Option[Double]) = {
    val candidates: Seq[String] = explicit match {
      case Some(p) => Seq(p) // explicit never falls back: the caller owns it
      case None =>
        val locals = for {
          n <- localName.toSeq
          d <- searchDirs
          f = new java.io.File(d, n)
          if f.isFile
        } yield f.getPath
        val scanned = searchDirs.iterator.map { d =>
          Option(d.listFiles()).toSeq.flatten
            .filter(_.getName.matches("BENCH_r\\d+\\.json"))
            .sortBy(_.getName).reverse.map(_.getPath)
        }.find(_.nonEmpty).getOrElse(Nil)
        locals ++ scanned
    }
    val hit = candidates.iterator
      .map { p =>
        val v = parseBaseline(p)
        // mins are not comparable across core counts (the driver runs a
        // lower-core scaling pass of the same battery): a SCANNED
        // candidate recording a different core count is skipped, never
        // compared. An EXPLICIT baseline is exempt — the caller owns that
        // comparison (and there is nothing to fall back to anyway).
        val cpuMismatch = explicit.isEmpty &&
          (for (want <- cpus; (_, _, got) <- v; g <- got)
            yield g != want).getOrElse(false)
        if (cpuMismatch) System.err.println(
          s"BENCH baseline candidate skipped (core-count mismatch): $p")
        else if (!v.exists(_._1.nonEmpty)) System.err.println(
          s"BENCH baseline candidate skipped (zero comparable queries): $p")
        (p, v, cpuMismatch)
      }
      .collectFirst { case (p, Some(v), false) if v._1.nonEmpty => (p, v) }
    hit match {
      case Some((p, (m, sf, _))) => (Some(p), m, sf)
      case None => // every candidate empty/unparseable: report the first
        (candidates.headOption, Map.empty, None)
    }
  }

  /** One baseline file's per-query mins + recorded sf + recorded core
    * count, None on any parse failure (the caller decides whether that is
    * loud). */
  private def parseBaseline(p: String)
      : Option[(Map[String, Double], Option[Double], Option[String])] = {
      scala.util.Try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val raw = mapper.readTree(new java.io.File(p))
        // the DRIVER's BENCH_r*.json wraps our line as {"n","rc",...,
        // "parsed":{...}} — r12's silent non-detection was exactly this:
        // queries_min is absent at the top level, so the baseline parsed
        // to an EMPTY map and detection compared against nothing. And when
        // stderr noise breaks the driver's own parse, "parsed" is null and
        // the line only survives inside the "tail" string — recover it.
        val root =
          if (raw.has("queries_min") || raw.has("queries")) raw
          else if (raw.has("parsed") && raw.get("parsed").isObject) raw.get("parsed")
          else if (raw.has("tail")) {
            val t = raw.get("tail").asText
            val i = t.indexOf("{\"metric\"")
            if (i >= 0) mapper.readTree(t.substring(i, t.lastIndexOf('}') + 1))
            else {
              // the driver keeps only the LAST chars of a noisy line: the
              // {"metric" head may be truncated away while "queries_min"
              // survives mid-string (BENCH_r17's actual on-disk form — the
              // r12 silent-non-detection recurring one layer deeper), so
              // recover just that flat object
              val j = t.indexOf("\"queries_min\":{")
              require(j >= 0, "no bench line in tail")
              val seg = t.substring(j + "\"queries_min\":".length)
              val obj = mapper.createObjectNode()
              obj.set[com.fasterxml.jackson.databind.JsonNode]("queries_min",
                mapper.readTree(seg.substring(0, seg.indexOf('}') + 1)))
              obj
            }
          } else raw
        val node = if (root.has("queries_min")) root.get("queries_min")
          else root.get("queries") // older rounds published medians only
        val m = Map.newBuilder[String, Double]
        node.properties().forEach(e => m += e.getKey -> e.getValue.asDouble)
        // sf: our line records a path string ("/root/testdata/sf0.1"),
        // the driver wrapper a bare number (0.1)
        val sf = Option(raw.get("sf")).orElse(Option(root.get("sf"))).flatMap { n =>
          if (n.isNumber) Some(n.asDouble) else sfNumber(n.asText)
        }
        // cpus: the driver wrapper records a top-level number, our own
        // full-fidelity line a string; an explicit JSON null means
        // "unrecorded" (comparable), not the literal string "null"
        val cpusRec = Option(raw.get("cpus")).orElse(Option(root.get("cpus")))
          .filter(!_.isNull).map(_.asText)
        (m.result(), sf, cpusRec)
      }.toOption
  }

  /** Queries whose successful-run MIN exceeds `factor`× the baseline min,
    * normalized by the RUN-LEVEL drift: when the whole artifact shifts
    * together (a noisy host window, a slower machine), that is ambient
    * noise, not a code regression — the r19 driver gate flagged a query in
    * a file untouched all round at 1.54× that a quiet rerun measured at
    * 1.11×. The normalizer is the LOWER MEDIAN of the per-query ratios
    * (robust: a genuine single-query spike barely moves it; a uniform
    * slowdown moves it exactly), clamped at ≥ 1 so a faster-than-baseline
    * run never tightens the gate, and applied only when ≥ 3 queries are
    * comparable (below that there is no "rest of the run" to estimate
    * drift from). A zero/negative baseline entry never flags (a failed
    * baseline run must not read as "everything regressed"). */
  def detectRegressions(mins: Seq[(String, Double)],
      baseline: Map[String, Double], factor: Double = 1.5): Seq[String] = {
    val ratios = mins.flatMap { case (k, minT) =>
      baseline.get(k).collect { case b if b > 0 && minT > 0 => (k, minT / b) }
    }
    val scale = driftScale(mins, baseline)
    ratios.collect { case (k, r) if r > factor * scale => k }
  }

  /** The run-level drift normalizer [[detectRegressions]] divides by: the
    * lower median of per-query min ratios vs the baseline, clamped ≥ 1,
    * 1.0 when fewer than 3 queries are comparable. Exposed separately
    * because the normalizer makes a genuinely UNIFORM slowdown invisible
    * by design (indistinguishable from host noise) — so main surfaces the
    * drift value itself in the JSON line and warns when it alone exceeds
    * the flag factor, leaving a global code/config regression for a human
    * to adjudicate instead of silently absorbing it. */
  def driftScale(mins: Seq[(String, Double)],
      baseline: Map[String, Double]): Double = {
    val ratios = mins.flatMap { case (k, minT) =>
      baseline.get(k).collect { case b if b > 0 && minT > 0 => minT / b }
    }
    if (ratios.length < 3) 1.0
    else math.max(1.0, ratios.sorted.apply((ratios.length - 1) / 2))
  }
}
