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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // contract queries plus bench-only raw-operator bodies (_op entries)
    val benchable = SparkEntry.queries ++ SparkEntry.benchOnly
    val names = {
      val h = SparkEntry.benchQueries.filter(benchable.contains)
      if (h.nonEmpty) h else SparkEntry.queries.keys.toSeq.sorted
    }
    // JVM/codegen warm-up on the smallest SF so measured times reflect
    // steady-state execution, not first-query classloading.
    names.headOption.foreach { n =>
      try benchable(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Per-query MEDIAN of `reps` runs: wall-clock on a shared VM swings
    // ±35% on identical code, so a single sample cannot distinguish a real
    // regression from noise. The median of 3 is robust to one outlier run.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = names.map { name =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink executes the FULL plan (a count() would let Spark prune
        // projections and undercount the real work)
        val err =
          try { benchable(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable =>
            System.err.println(s"BENCH FAILURE in $name: $e")
            Some(e.toString.replaceAll("[\"\\\\\n]", " ").take(200)) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      // failed reps return fast — including them would bias the median low,
      // so only successful runs count toward the timing; 0.0 if none passed
      val ok = samples.collect { case (t, None) => t }.sorted
      val median = if (ok.isEmpty) 0.0 else ok(ok.length / 2)
      (name, median, samples.flatMap(_._2).headOption)
    }
    // A failed query must never read as a speedup: report per-query errors
    // and exit non-zero so the driver records the regression.
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.count(_._3.nonEmpty)
    println(s"""{"metric":"total","value":$total,"unit":"sec","aggregation":"median_of_$reps","queries":$qs,"failed":$failed,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
